package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-compaction semantics (`commitlog/compactor.go:35-104`,
  * `pipeline/node.go:417-436`): keep only the latest entry per key,
  * preserving order by offset. In Spark this is a last-value-per-key
  * aggregation.
  *
  * Two implementations:
  *   - `lastPerKey`: window row_number — fully deterministic with an explicit
  *     total tie-break ordering (needed for oracle equality).
  *   - `lastPerKeyMaxBy`: `max_by(struct, offset)` single-shuffle aggregate —
  *     the cheaper plan when the offset is unique (one shuffle, partial
  *     aggregation map-side; preferred at scale).
  *
  * Scale: both shuffle once on the key. The window variant sorts within
  * partitions; max_by does partial aggregation before the shuffle, so its
  * shuffled bytes are ~|distinct keys|, not |rows| — use it when keys are
  * hot/skewed.
  */
object Compaction {

  /** Keep the newest row per key, newest = max by `orderCols` (ties broken by
    * the full orderCols list; make it a total order for determinism). */
  def lastPerKey(keys: Seq[String], orderCols: Seq[Column])
                (df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** max_by variant: single aggregation, unique `offset` required. */
  def lastPerKeyMaxBy(keys: Seq[String], offset: String)
                     (df: DataFrame): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains)
    val packed = struct(valueCols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(packed, col(offset)).as("__v"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__v.$c").as(c)): _*)
  }
}
