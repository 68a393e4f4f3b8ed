package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters sketch: `freq_items(item, capacity)` keeps at
  * most `capacity` (item, count) counters per group — Misra–Gries with
  * the mergeable-summaries combine rule (Agarwal et al., PODS'12): two
  * summaries merge by adding counters, then decrementing every counter
  * by the (capacity+1)-th largest count and dropping the non-positive
  * ones.
  *
  * Scale contract (the reason this exists instead of `groupBy(item)
  * .count().orderBy(desc)`): state is O(capacity) per group regardless
  * of input size or cardinality, partial-combines map-side, and the
  * shuffle carries one ≤capacity summary per (partition, group) — a
  * "top domains over 100 TB" query never materializes the full
  * domain→count table or sorts it. Guarantees: every item with true
  * count > n/(capacity+1) is present; each reported count is a LOWER
  * bound, short by at most the summary's `err` (the total decrement
  * applied). When capacity exceeds the number of distinct items, no
  * decrement ever fires, `err` is 0, and counts are EXACT — which is
  * what lets the sf0.01 oracle hash-match a plain GROUP BY COUNT.
  */
object FreqItemsAggregate {

  /** Heavy hitters as array<struct<item:<type>, cnt:long, err:long>>,
    * sorted (cnt desc, item asc). `err` is the summary-wide maximum
    * undercount (0 ⇒ every cnt is exact). Null items are skipped. */
  def freq_items(item: Column, capacity: Int): Column =
    Bridge.column(FreqItemsAgg(Bridge.expression(item), capacity)
      .toAggregateExpression())
}

/** Mutable Misra–Gries summary. Items are internal Catalyst values
  * (UTF8String already copied by the caller). */
final class MGSummary(val capacity: Int) {
  val counts = new java.util.HashMap[Any, Long](math.min(capacity * 2, 64))
  var decs: Long = 0L // total decrement ever applied (max undercount)

  /** Classic per-item MG update: bump an existing counter, claim a free
    * slot, or — table full and item unseen — decrement every counter by
    * one and drop zeros (the incoming item is absorbed into the
    * undercount bound, not inserted). */
  def add(item: Any): Unit = {
    val cur = counts.get(item)
    if (cur != 0L) counts.put(item, cur + 1L)
    else if (counts.size < capacity) counts.put(item, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - 1L
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
      decs += 1L
    }
  }

  /** Merge-combine: add counters, then if over capacity shrink by the
    * (capacity+1)-th largest count. */
  def mergeFrom(other: MGSummary): MGSummary = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    decs += other.decs
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // (capacity+1)-th largest = index size-capacity-1 in ascending order
      val cut = vals(vals.length - capacity - 1)
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0L) eit.remove() else e.setValue(nv)
      }
      decs += cut
    }
    this
  }
}

case class FreqItemsAgg(itemExpr: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] {

  require(capacity > 0, "freq_items requires capacity > 0")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", itemExpr.dataType),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!TopKAggregate.supportedIdTypes.contains(itemExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"freq_items item type ${itemExpr.dataType.sql} unsupported; " +
          s"supported: ${TopKAggregate.supportedIdTypes.map(_.sql).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val itemType: DataType = itemExpr.dataType
  private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(itemType).asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = itemExpr.eval(input)
    if (v != null) {
      val item = v match {
        case u: UTF8String => u.clone() // unsafe-row buffers are reused
        case other => other
      }
      buf.add(item)
    }
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary =
    buf.mergeFrom(other)

  override def eval(buf: MGSummary): Any = {
    val entries = new Array[(Any, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val sorted = entries.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && itemOrdering.lt(a._1, b._1))
    }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      new GenericInternalRow(Array[Any](item, cnt, buf.decs))
    })
  }

  private def writeItem(out: java.io.DataOutputStream, v: Any): Unit =
    itemType match {
      case ByteType => out.writeByte(v.asInstanceOf[Byte].toInt)
      case ShortType => out.writeShort(v.asInstanceOf[Short].toInt)
      case IntegerType | DateType => out.writeInt(v.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType =>
        out.writeLong(v.asInstanceOf[Long])
      case FloatType => out.writeFloat(v.asInstanceOf[Float])
      case DoubleType => out.writeDouble(v.asInstanceOf[Double])
      case StringType =>
        val b = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      case t => throw new IllegalStateException(s"unreachable item type $t")
    }

  private def readItem(in: java.io.DataInputStream): Any =
    itemType match {
      case ByteType => in.readByte()
      case ShortType => in.readShort()
      case IntegerType | DateType => in.readInt()
      case LongType | TimestampType | TimestampNTZType => in.readLong()
      case FloatType => in.readFloat()
      case DoubleType => in.readDouble()
      case StringType =>
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        UTF8String.fromBytes(b)
      case t => throw new IllegalStateException(s"unreachable item type $t")
    }

  override def serialize(buf: MGSummary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(16 + 24 * buf.counts.size)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.capacity); out.writeLong(buf.decs)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getValue); writeItem(out, e.getKey)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = new MGSummary(in.readInt())
    buf.decs = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val cnt = in.readLong(); val item = readItem(in)
      buf.counts.put(item, cnt)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}
