package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Resample

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gridFill: dense grid, carried gauge, gap flags, bucket ties") {
    val rows = Seq(
      // key a: 10:00 has two readings (tie broken by latest (ts, id)),
      // 11:00 empty (gap), 12:00 has one
      (1L, "a", ts("2024-03-01 10:05:00"), 5.0),
      (2L, "a", ts("2024-03-01 10:20:00"), 7.0),
      (3L, "a", ts("2024-03-01 12:59:59"), 9.0),
      // key b: single bucket only → one row, no gaps
      (4L, "b", ts("2024-03-01 23:30:00"), 1.5))
      .toDF("event_id", "k", "ts", "value")
    val got = Resample.gridFill(rows, "k", "ts", "value", "event_id", "hour")
      .orderBy("k", "bucket")
      .as[(String, Timestamp, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("a", ts("2024-03-01 10:00:00"), 2L, 7.0, false),
      ("a", ts("2024-03-01 11:00:00"), 0L, 7.0, true),
      ("a", ts("2024-03-01 12:00:00"), 1L, 9.0, false),
      ("b", ts("2024-03-01 23:00:00"), 1L, 1.5, false)))
  }

  test("gridFill: null keys and null timestamps are excluded, not half-joined") {
    val rows = Seq(
      (1L, Some("a"), Some(ts("2024-03-01 10:00:00")), 1.0),
      (2L, None, Some(ts("2024-03-01 10:30:00")), 2.0),
      (3L, Some("a"), None, 3.0))
      .toDF("event_id", "k", "ts", "value")
    val got = Resample.gridFill(rows, "k", "ts", "value", "event_id", "hour")
      .as[(String, java.sql.Timestamp, Long, Double, Boolean)].collect()
    assert(got.toSeq == Seq(("a", ts("2024-03-01 10:00:00"), 1L, 1.0, false)))
  }

  test("gridFill: same-ts tie falls back to larger event_id") {
    val rows = Seq(
      (1L, "a", ts("2024-03-01 10:00:01"), 5.0),
      (9L, "a", ts("2024-03-01 10:00:01"), 6.0))
      .toDF("event_id", "k", "ts", "value")
    val got = Resample.gridFill(rows, "k", "ts", "value", "event_id", "hour")
      .select("gauge").as[Double].collect()
    assert(got.toSeq == Seq(6.0))
  }

  test("gridFill fails loudly on a pathological span instead of exploding") {
    // one stray 1970 timestamp next to a 2024 one on a minute grid would
    // need ~28M grid points in a single task — the guard must refuse
    val rows = Seq(
      (1L, "a", ts("1970-01-01 00:00:00"), 1.0),
      (2L, "a", ts("2024-03-01 10:00:00"), 2.0))
      .toDF("event_id", "k", "ts", "value")
    val e = intercept[Exception] { // SparkRuntimeException from raise_error
      Resample.gridFill(rows, "k", "ts", "value", "event_id", "minute")
        .count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("gridFill") && msg.contains("grid points"), msg)
    // a raised bound lets the same data through
    assert(Resample.gridFill(rows, "k", "ts", "value", "event_id", "day",
      maxGridPoints = 30000L).count() > 0)
  }

  test("gridFill on the events fixture: grid is dense and gauges never null") {
    val ev = graft.core.Tables.table(spark, sf, "events")
    val out = Resample.gridFill(ev, "event_type", "ts", "value",
      "event_id", "hour").cache()
    // dense: per key, #buckets == span hours + 1
    val spans = out.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        ((unix_timestamp(max(col("bucket"))) -
          unix_timestamp(min(col("bucket")))) / 3600 + 1).as("want"))
      .as[(String, Long, Double)].collect()
    assert(spans.nonEmpty && spans.forall { case (_, n, want) => n == want.toLong })
    assert(out.filter(col("gauge").isNull).count() == 0)
    // a gap bucket's gauge equals the previous non-gap bucket's gauge
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("bucket")
    val bad = out.withColumn("prev", lag(col("gauge"), 1).over(w))
      .filter(col("is_gap") && (col("gauge") =!= col("prev")))
    assert(bad.count() == 0)
    out.unpersist()
  }
}
