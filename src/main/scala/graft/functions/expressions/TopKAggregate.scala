package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregation: `top_k_by(sim, id, k)` keeps the k
  * best (sim desc, id asc ties) rows per group in O(k) state.
  *
  * This is the scale-correct replacement for `row_number over
  * (partition by group order by sim desc) <= k`: the window form
  * shuffles EVERY scored row to one reducer per group (parallelism =
  * #groups, each reducer sorting |corpus| rows), while this aggregate
  * partial-combines map-side — each input partition maintains a ≤k heap
  * per group, so the shuffle carries only ≤ (#partitions × #groups)
  * k-sized buffers and the final merge per group is #partitions heap
  * merges of size k. At 100 TB the shuffle volume drops from |corpus|
  * rows per query to k×#partitions rows per query.
  *
  * Runs under `ObjectHashAggregateExec` (same machinery as
  * `collect_list`/`percentile`) with partial + final modes, so it works
  * unchanged in groupBy aggregation and under AQE.
  */
object TopKAggregate {
  /** Top-k rows as array<struct<corpus_id:long, sim:double>>, best first.
    * Null sims are skipped (a null cosine means a zero-norm vector, which
    * "never matches" by contract — see Similarity.cosine). */
  def top_k_by(sim: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByAggregate(Bridge.expression(sim),
      Bridge.expression(id), k).toAggregateExpression())
}

/** Mutable bounded min-heap: the root is the WORST kept entry (lowest sim;
  * ties: highest id), so a better candidate replaces the root in O(log k).
  */
final class TopKHeap(val k: Int) {
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // entry a is worse than entry b (worse = evicted first)
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(sims(i), ids(i), sims(p), ids(p))) {
        val ts = sims(i); val ti = ids(i)
        sims(i) = sims(p); ids(i) = ids(p)
        sims(p) = ts; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worse(sims(l), ids(l), sims(w), ids(w))) w = l
      if (r < size && worse(sims(r), ids(r), sims(w), ids(w))) w = r
      if (w == i) return
      val ts = sims(i); val ti = ids(i)
      sims(i) = sims(w); ids(i) = ids(w)
      sims(w) = ts; ids(w) = ti
      i = w
    }
  }

  def offer(sim: Double, id: Long): Unit =
    if (size < k) {
      sims(size) = sim; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(sims(0), ids(0), sim, id)) {
      sims(0) = sim; ids(0) = id
      siftDown()
    }

  def mergeFrom(other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { offer(other.sims(i), other.ids(i)); i += 1 }
    this
  }

  /** (sim, id) pairs sorted best-first: sim desc, id asc. */
  def sorted: Array[(Double, Long)] =
    Array.tabulate(size)(i => (sims(i), ids(i)))
      .sortBy { case (s, i) => (-s, i) }
}

case class TopKByAggregate(simExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "top_k_by requires k > 0")

  override def children: Seq[Expression] = Seq(simExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("corpus_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = simExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap =
    buf.mergeFrom(other)

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.sims(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      heap.offer(s, id)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(simExpr = newChildren(0), idExpr = newChildren(1))
}
