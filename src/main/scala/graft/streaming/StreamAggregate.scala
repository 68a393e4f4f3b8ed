package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked tumbling-window aggregation — the streaming form of the
  * batch `time_window_agg` (SURVEY §2.7: the reference flushes per
  * commit-interval; Structured Streaming's watermark+window is the
  * principled version of that flush, with late-data semantics instead
  * of wall-clock hope).
  *
  * Append mode emits each (window, key) row exactly once, when the
  * watermark passes the window end; state is O(1) per OPEN window/key
  * and is dropped at emission — a 100 TB/day stream holds only the
  * watermark horizon's windows in state, never history. Rows later than
  * the watermark delay are dropped by contract (asserted in the spec —
  * that is the one place streaming and batch answers legitimately
  * diverge).
  */
object StreamAggregate {

  /** count + decimal-exact sum of `valueCol` per (tumbling window, key).
    * Decimal sum: same determinism rule as every batch oracle query —
    * partial aggregation order must not change the answer. */
  def tumbling(stream: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, watermarkDelay: String,
      valueCol: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).as("sum_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))
}
