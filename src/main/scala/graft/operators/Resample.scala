package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket an irregular event stream onto a
  * fixed per-key grid and fill the empty buckets — the resample/gap-fill
  * step every metrics pipeline runs before rate math, joins against
  * other series, or model feature windows (irregular series don't align;
  * grids do).
  *
  * Scale shape: one aggregation to per-bucket rows (map-side partial —
  * the raw events collapse before any shuffle), one tiny per-key span
  * aggregate whose `sequence()` explode generates the grid (span/step
  * rows per key, no cross join against a global calendar), and one
  * forward-fill window PER KEY ordered by bucket. Parallelism is #keys;
  * a 100 TB event log over millions of series keys spreads evenly, and
  * no task ever sees more than one key's grid. (A single monster series
  * needs range-chunked fill — different operator.)
  *
  * The carried value passes through UNTOUCHED (no float arithmetic), so
  * results are bit-exact and cross-engine verifiable: the gauge at a gap
  * bucket is exactly the last observed reading (`max_by(value, (ts,
  * id))` of the latest earlier bucket), `n_events` is 0, `is_gap` true.
  */
object Resample {

  /** Hourly/minutely/daily grid per `keyCol` from each key's first to
    * last bucket: `n_events` (0 at gaps), `gauge` = last observed
    * `valueCol` carried forward (ties within a bucket broken by (tsCol,
    * idCol) — latest wins), `is_gap`. `unit` is a date_trunc unit:
    * "minute", "hour", or "day".
    *
    * `maxGridPoints` bounds the per-key grid: one stray 1970 timestamp
    * on a minute grid would otherwise build a multi-million-element
    * `sequence()` array inside a single task. A key whose span exceeds
    * the bound fails LOUDLY (with the key and the point count) rather
    * than OOMing an executor. */
  def gridFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String, unit: String,
      maxGridPoints: Long = 1000000L): DataFrame = {
    require(Seq("minute", "hour", "day").contains(unit),
      s"unsupported grid unit: $unit")
    val stepSecs = unit match {
      case "minute" => 60L; case "hour" => 3600L; case "day" => 86400L
    }
    // a null series key is not a series (and a null ts has no bucket):
    // excluded explicitly here rather than half-joined downstream
    val clean = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val bucketed = clean
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max_by(col(valueCol), struct(col(tsCol), col(idCol))).as("last_value"))
    // the guard rides on b1 (when/otherwise keeps it in the data path, so
    // column pruning can't drop it); day spans are upper-bounded via the
    // fixed step, conservative only across DST for minutes/hours
    val grid = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .withColumn("__points",
        (unix_timestamp(col("b1")) - unix_timestamp(col("b0"))) /
          lit(stepSecs) + 1)
      .withColumn("b1",
        when(col("__points") <= lit(maxGridPoints), col("b1"))
          .otherwise(raise_error(concat(
            lit(s"gridFill: key "), col(keyCol).cast("string"),
            lit(" spans "), col("__points").cast("string"),
            lit(s" $unit grid points > max $maxGridPoints — clean outlier " +
              "timestamps or raise maxGridPoints")))
            .cast("timestamp")))
      .select(col(keyCol),
        explode(expr(s"sequence(b0, b1, interval 1 $unit)")).as("bucket"))
    val ffill: Column = last(col("last_value"), ignoreNulls = true)
      .over(Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grid.join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        ffill.as("gauge"),
        col("n_events").isNull.as("is_gap"))
  }
}
