package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch (Cormode & Muthukrishnan 2005) — the POINT-FREQUENCY
  * leg of the sketch family (HLL: distinct counts, KLL: quantiles,
  * Misra–Gries: the top-k heavy-hitter LIST, theta: set ops; CM answers
  * "how often did THIS key occur" for any key, bounded one-sided error).
  * depth × width counters; each of the `depth` rows hashes the key into
  * one of `width` cells and increments it; the estimate is the MIN over
  * the key's cells — always ≥ the true count, and ≤ true + 2N/width with
  * probability 1 − (1/2)^depth. Counters merge by elementwise ADDITION,
  * so the at-scale shape is the standard daily→monthly rollup: O(d·w)
  * bytes per (group, day), merged without rescanning.
  *
  * Unlike KLL there is NO randomness at runtime — the hash rows are
  * fixed — so the whole pipeline (update, merge, estimate) is exactly
  * reproducible, and reproducible OUTSIDE the engine: the row hash is
  * md5-derived (the [[Md5Hash]] rationale — md5 is the one hash this
  * engine and the DuckDB oracle compute identically), bucket =
  * first-56-bits-of md5("i:" + key) mod width. With width a power of
  * two ≤ 256 the oracle's bucket is a 2-hex-digit extraction, and the
  * estimate has a CLOSED FORM in SQL: est(key) = min over rows i of
  * Σ counts of all keys colliding with key in row i — so the sketch is
  * hash-gated end-to-end, not pinned.
  */
object CountMinAggregate {

  /** Aggregate string keys into a serialized CM(depth, width) sketch. */
  def cms_agg(item: Column, depth: Int, width: Int): Column =
    Bridge.column(CmsAgg(Bridge.expression(item.cast("string")),
      depth, width).toAggregateExpression())

  /** Merge serialized CM sketches (same depth/width) by counter sums. */
  def cms_merge_agg(sketch: Column, depth: Int, width: Int): Column =
    Bridge.column(CmsMergeAgg(Bridge.expression(sketch), depth, width)
      .toAggregateExpression())

  /** Point-frequency estimate of `item` from a serialized sketch. */
  def cms_estimate(sketch: Column, item: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch),
      Bridge.expression(item.cast("string"))))

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Row `i`'s bucket for `key`: the first 56 bits (7 bytes, big-endian —
    * always non-negative) of md5(i + ":" + key), mod width. 56 bits so
    * the value is exact in any engine's signed 64-bit integer. */
  private[graft] def bucket(i: Int, key: UTF8String, width: Int): Int = {
    val d = md.get()
    d.reset()
    d.update(s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val dig = d.digest(key.getBytes)
    var h = 0L
    var j = 0
    while (j < 7) { h = (h << 8) | (dig(j) & 0xFFL); j += 1 }
    (h % width).toInt
  }

  private[graft] final class CmsBuffer(val depth: Int, val width: Int) {
    val counts = new Array[Long](depth * width)
    def add(key: UTF8String): Unit = {
      var i = 0
      while (i < depth) {
        counts(i * width + bucket(i, key, width)) += 1L
        i += 1
      }
    }
    def mergeFrom(other: CmsBuffer): CmsBuffer = {
      require(other.depth == depth && other.width == width,
        s"cms merge shape mismatch: ${other.depth}x${other.width} vs ${depth}x$width")
      var j = 0
      while (j < counts.length) { counts(j) += other.counts(j); j += 1 }
      this
    }
    def estimate(key: UTF8String): Long = {
      var best = Long.MaxValue
      var i = 0
      while (i < depth) {
        val c = counts(i * width + bucket(i, key, width))
        if (c < best) best = c
        i += 1
      }
      best
    }
    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + counts.length * 8)
      bb.putInt(depth).putInt(width)
      counts.foreach(bb.putLong)
      bb.array()
    }
  }

  private[graft] def fromBytes(bytes: Array[Byte]): CmsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt
    val buf = new CmsBuffer(d, w)
    var j = 0
    while (j < buf.counts.length) { buf.counts(j) = bb.getLong; j += 1 }
    buf
  }
}

/** Common TypedImperativeAggregate plumbing over a CM buffer. */
sealed trait CmsAggBase
    extends TypedImperativeAggregate[CountMinAggregate.CmsBuffer] {
  def depth: Int
  def width: Int
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): CountMinAggregate.CmsBuffer =
    new CountMinAggregate.CmsBuffer(depth, width)
  override def merge(buf: CountMinAggregate.CmsBuffer,
      other: CountMinAggregate.CmsBuffer): CountMinAggregate.CmsBuffer =
    buf.mergeFrom(other)
  override def eval(buf: CountMinAggregate.CmsBuffer): Any = buf.toBytes
  override def serialize(buf: CountMinAggregate.CmsBuffer): Array[Byte] =
    buf.toBytes
  override def deserialize(bytes: Array[Byte]): CountMinAggregate.CmsBuffer =
    CountMinAggregate.fromBytes(bytes)
}

case class CmsAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  require(depth >= 1 && depth <= 16, "cms_agg requires 1 <= depth <= 16")
  require(width >= 2, "cms_agg requires width >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_agg input must be STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def update(buf: CountMinAggregate.CmsBuffer,
      input: InternalRow): CountMinAggregate.CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): CmsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

case class CmsMergeAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_merge_agg input must be BINARY (a serialized sketch), got " +
          child.dataType.sql)
    else TypeCheckResult.TypeCheckSuccess

  override def update(buf: CountMinAggregate.CmsBuffer,
      input: InternalRow): CountMinAggregate.CmsBuffer = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeFrom(CountMinAggregate.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

/** Point estimate: min over the key's depth cells (null sketch → null). */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate sketch must be BINARY, got ${left.dataType.sql}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_estimate key must be STRING, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CountMinAggregate.fromBytes(sketch.asInstanceOf[Array[Byte]])
      .estimate(key.asInstanceOf[UTF8String])

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
