package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.streaming.StreamPipeline.ParquetUpsertSink

/** Continuous MERGING rollup table — the sink where the mergeable
  * sketches earn their keep: a stream of raw events maintains a stored
  * per-key table of sketch/counter columns, and each epoch MERGES into
  * the stored rows (sketch union, count add) instead of replacing them.
  *
  * This is the 100 TB observability/rollup shape: the table holds one
  * row per (key, day) with HLL/KLL/MG sketch columns of bounded size; an
  * epoch touches only the buckets its keys hash into (inherited from
  * `ParquetUpsertSink`: hash-bucketed layout, touched-bucket-only
  * rewrite, atomic manifest commit, listing GC, idempotent replay); and
  * queries over the table union sketches across any time range without
  * ever rescanning raw history.
  *
  * Two caller-supplied pieces define the rollup:
  *   - `epochAgg`: raw batch → one row per key with the value columns in
  *     table schema (e.g. groupBy(key, day).agg(kll_sketch_agg(value)));
  *   - `mergeExprs`: aggregations that combine value columns across
  *     the stored row and the epoch row (kll_merge_agg, sum, ...).
  *
  * REPLAY: merge-by-add is NOT idempotent (unlike the CDC sink's
  * replace-by-id), so this sink sets `skipReplayedEpochs`: the applied
  * epoch id rides the manifest (atomic with the commit) and a replayed
  * epoch at or below it is skipped, never re-merged. Consequence:
  * admin rewind→replay does not apply to a rollup table — rebuild it
  * from scratch instead (sketches cannot be un-merged anyway).
  */
object SketchRollup {
  import org.apache.spark.sql.types._

  /** Registry sink (`sketch-rollup`, r10): the generic merging rollup as
    * a DECLARABLE pipeline sink — a config row turns any source into a
    * continuously-maintained per-(group, day) sketch table. `kind`
    * selects the sketch family: "cms" (Count–Min point frequencies,
    * depth×width), "kll" (quantiles, k), "theta" (distinct-count set
    * ops, lgK); all three share the one epoch-fenced merge engine.
    * The inner sink binds lazily to the first batch's session (the
    * registry constructs sinks without one). */
  final case class RollupSink(kind: String, dir: String, groupCol: String,
      tsCol: String, valueCol: String, depth: Int, width: Int, k: Int,
      lgK: Int, numBuckets: Int)
    extends graft.sources.Connectors.EpochSink {

    require(Set("cms", "kll", "theta")(kind),
      s"sketch-rollup kind must be cms|kll|theta, got '$kind'")

    @transient private var inner: SketchRollupSink = _

    private def schema = StructType(Seq(
      StructField(groupCol, StringType),
      StructField("day", DateType),
      StructField("sk", BinaryType),
      StructField("n", LongType)))

    private def skAgg: Column = kind match {
      case "cms" => graft.functions.expressions.CountMinAggregate
        .cms_agg(col(valueCol), depth, width)
      case "kll" => graft.functions.expressions.KllAggregate
        .kll_sketch_agg(col(valueCol).cast("double"), k)
      case "theta" => theta_sketch_agg(col(valueCol), lgK)
    }

    private def skMerge: Column = kind match {
      case "cms" => graft.functions.expressions.CountMinAggregate
        .cms_merge_agg(col("sk"), depth, width)
      case "kll" => graft.functions.expressions.KllAggregate
        .kll_merge_agg(col("sk"), k)
      case "theta" => theta_union_agg(col("sk"), lgK)
    }

    private def build(spark: SparkSession): SketchRollupSink =
      new SketchRollupSink(spark, dir, Seq(groupCol, "day"), schema,
        numBuckets,
        epochAgg = b => b
          .groupBy(col(groupCol).cast("string").as(groupCol),
            col(tsCol).cast("date").as("day"))
          .agg(skAgg.as("sk"), count(lit(1)).as("n")),
        mergeExprs = Seq(skMerge.as("sk"), sum(col("n")).as("n")))

    def writeEpoch(df: DataFrame, epochId: Long): Unit = synchronized {
      if (inner == null) inner = build(df.sparkSession)
      inner.applyBatch(df, epochId)
    }

    /** The stored rollup table (for probes/tests). */
    def state(spark: SparkSession): DataFrame = synchronized {
      if (inner == null) inner = build(spark)
      inner.currentState()
    }
  }
}

final class SketchRollupSink(spark: SparkSession, targetDir: String,
    keyCols: Seq[String], baseSchema: StructType, numBuckets: Int,
    epochAgg: DataFrame => DataFrame, mergeExprs: Seq[Column])
  extends ParquetUpsertSink(spark, targetDir, keyCols.head, baseSchema,
    numBuckets) {

  require(keyCols.nonEmpty, "rollup needs at least one key column")

  override protected def skipReplayedEpochs: Boolean = true

  override protected def bucketExpr: Column =
    pmod(hash(keyCols.map(col): _*), lit(numBuckets))

  override protected def epochWrites(batch: DataFrame): DataFrame =
    epochAgg(batch)

  override protected def nextState(base: DataFrame,
      writes: DataFrame): DataFrame =
    base.unionByName(writes)
      .groupBy(keyCols.map(col): _*)
      .agg(mergeExprs.head, mergeExprs.tail: _*)
}
