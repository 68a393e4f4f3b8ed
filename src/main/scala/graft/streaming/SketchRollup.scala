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
