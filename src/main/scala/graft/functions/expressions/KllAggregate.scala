package graft.functions.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable streaming-quantile sketches (DataSketches KLL) — the third
  * leg of the engine's sketch set (HLL: distinct counts, Misra–Gries:
  * heavy hitters, KLL: quantiles). The at-scale shape is the same
  * daily→monthly rollup as `hll_daily_users`: each partition/day keeps an
  * O(k log n) sketch, sketches union WITHOUT rescanning, and the rank
  * error (~1.65/√k for k=200: <1%) is a published guarantee — unlike
  * `percentile_approx` re-runs over raw history, a 100 TB fleet never
  * stores more than the sketch bytes per (group, day).
  *
  * `kll_sketch_agg` aggregates raw doubles into a serialized sketch
  * (binary); `kll_merge_agg` unions serialized sketches; `kll_quantiles`
  * evaluates rank queries against a sketch column. Split this way so the
  * sketch itself is a first-class column value that can be stored in a
  * rollup table and merged later — the property that makes it scale.
  *
  * NOTE: unlike every other operator in this engine, KLL is RANDOMIZED
  * by design (compaction keeps odd or even survivors on a coin flip —
  * that is how the error guarantee is proved), so re-runs agree in rank,
  * not bit-for-bit; the query is declared rows-only, never oracled.
  */
object KllAggregate {

  /** Aggregate raw values into a serialized KLL(k) sketch (binary). */
  def kll_sketch_agg(value: Column, k: Int = 200): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(value.cast("double")), k)
      .toAggregateExpression())

  /** Union serialized KLL sketches into one (binary). */
  def kll_merge_agg(sketch: Column, k: Int = 200): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(sketch), k)
      .toAggregateExpression())

  /** Quantiles at the given ranks from a serialized sketch column
    * (array<double>, one per rank; null for an empty sketch). */
  def kll_quantiles(sketch: Column, probs: Seq[Double]): Column = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "ranks must be within [0, 1]")
    Bridge.column(KllQuantiles(Bridge.expression(sketch), probs))
  }

  private[expressions] def empty(k: Int): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  private[expressions] def fromBytes(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Common TypedImperativeAggregate plumbing over a KLL buffer. */
sealed trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): KllDoublesSketch =
    KllAggregate.empty(k)
  override def merge(buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = { buf.merge(other); buf }
  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllAggregate.fromBytes(bytes)
}

case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  require(k >= 8, "kll_sketch_agg requires k >= 8")

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg input must be DOUBLE, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

case class KllMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  require(k >= 8, "kll_merge_agg requires k >= 8")

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_merge_agg input must be BINARY (a serialized sketch), got " +
          child.dataType.sql)
    else TypeCheckResult.TypeCheckSuccess

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllAggregate.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

/** Rank queries against a serialized sketch: array of quantiles, one per
  * requested rank (inclusive search criteria — the DataSketches default). */
case class KllQuantiles(child: Expression, probs: Seq[Double])
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles input must be BINARY, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val sk = KllAggregate.fromBytes(v.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) return null
    new GenericArrayData(probs.map(p =>
      sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)).toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
