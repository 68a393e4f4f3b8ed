package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session while the gap between them stays under `gapSeconds`; a
  * larger gap starts a new session.
  *
  * Classic two-window formulation, both windows over the SAME (key, ts)
  * ordering so Catalyst plans ONE shuffle + sort:
  *   is_new = (ts - lag(ts)) > gap  →  session_idx = running sum of is_new.
  */
object Sessionize {

  /** Adds `session_idx` (0-based per key) to the frame. `tieBreak` must
    * make the ordering total for determinism. */
  def assignSessions(df: DataFrame, keys: Seq[String], tsCol: String,
                     gapSeconds: Long, tieBreak: Seq[String]): DataFrame = {
    val order = (col(tsCol) +: tieBreak.map(col))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    // gap compared in MICROSECONDS: integer-second truncation would
    // disagree with fractional-second engines at the boundary
    val isNew = when(prev.isNull, lit(0))
      .when(unix_micros(col(tsCol).cast("timestamp")) -
            unix_micros(prev.cast("timestamp")) > gapSeconds * 1000000L,
        lit(1))
      .otherwise(lit(0))
    df.withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(run).cast("bigint"))
      .drop("__new")
  }

  /** Per-session rollup: bounds, event count, value sum (decimal-exact). */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String,
                   gapSeconds: Long, valueCol: String,
                   tieBreak: Seq[String]): DataFrame =
    assignSessions(df, keys, tsCol, gapSeconds, tieBreak)
      .groupBy((keys.map(col) :+ col("session_idx")): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(14,2)")).cast("double")
          .as("value_sum"))
}
