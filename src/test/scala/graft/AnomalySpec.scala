package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Anomaly

/** Rolling z-score flags: spike detection, cold start, self-masking. */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2024-01-01 05:$minute%02d:00")

  test("a planted spike flags; warm stable history does not") {
    // 30 minutes of value 10±small jitter, then one 500 spike
    val rows = (0 until 30).map(m =>
      ("k", ts(m), 10.0 + (m % 3) * 0.1)) :+ (("k", ts(30), 500.0))
    val out = Anomaly.zscoreFlags(rows.toDF("k", "ts", "v"),
      "k", "ts", "v", rangeSeconds = 3600, minHist = 12)
      .collect()
    assert(out.length == 1 && out(0).getDouble(2) == 500.0,
      out.mkString(","))
    assert(out(0).getLong(3) == 30) // full history seen
  }

  test("cold start: fewer than minHist points never flag") {
    val rows = (0 until 10).map(m => ("k", ts(m), 10.0)) :+
      (("k", ts(10), 500.0))
    assert(Anomaly.zscoreFlags(rows.toDF("k", "ts", "v"),
      "k", "ts", "v", rangeSeconds = 3600, minHist = 12).count() == 0)
  }

  test("the spike cannot mask itself (history excludes the current row) " +
      "and keys are independent") {
    // two keys: key a has the spike, key b the same minute is normal
    val rows = (0 until 20).flatMap(m => Seq(
      ("a", ts(m), 10.0), ("b", ts(m), 20.0))) ++
      Seq(("a", ts(20), 400.0), ("b", ts(20), 20.0))
    val out = Anomaly.zscoreFlags(rows.toDF("k", "ts", "v"),
      "k", "ts", "v", rangeSeconds = 3600, minHist = 12)
      .select("k", "v").as[(String, Double)].collect().toSet
    assert(out == Set(("a", 400.0)), out.toString)
  }

  test("plan: per-key bounded range window, no global exchange-to-one") {
    val rows = (0 until 30).map(m => ("k", ts(m), 10.0))
    val plan = Anomaly.zscoreFlags(rows.toDF("k", "ts", "v"),
      "k", "ts", "v").queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1500))
    // partitioned window: the partitionBy key appears in the spec — a
    // global window (the scale killer) would shuffle everything to one
    // task and logs the "No Partition Defined" warning instead
    assert(plan.contains("partitionBy") || plan.contains("PartitionBy")
      || plan.contains("windowspecdefinition(k"), plan.take(1500))
  }

  test("DECIMAL(38,0) overflow is an ERROR, never a silent un-flag") {
    // |v|=1e16 → grid 1e22 → Σ(v²) ≈ n·1e44 overflows 38 digits within
    // the first frame. Under ANSI Spark the decimal sum itself throws;
    // under non-ANSI it returns NULL, which unguarded would coalesce to
    // "not flagged" — the guard must raise instead (false negatives on
    // anomaly FLAGS are the worst failure mode for a monitor).
    val rows = (0 until 20).map(m => ("k", ts(m), 1.0e16 + m))
    val df = rows.toDF("k", "ts", "v")
    val prior = spark.conf.get("spark.sql.ansi.enabled", "true")
    try {
      for (ansi <- Seq("false", "true")) {
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        val e = intercept[Exception] {
          Anomaly.zscoreFlags(df, "k", "ts", "v",
            rangeSeconds = 3600, minHist = 12).collect()
        }
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ messages(t.getCause)
        // non-ANSI: our raise_error guard ("overflow"); ANSI: Spark's
        // own NUMERIC_VALUE_OUT_OF_RANGE from the decimal sum
        assert(messages(e).exists(m =>
          m.toLowerCase.contains("overflow") ||
            m.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
            m.contains("cannot be represented as Decimal")),
          s"ansi=$ansi: ${messages(e).mkString(" | ")}")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  test("in-range magnitudes stay clear of the overflow bound") {
    // the documented bound: n³·(max|v|·1e6)² < 1e38/z² — 30 rows at
    // |v| ≤ 1e3 is ~1e22, five orders inside it; flags still fire
    val rows = (0 until 30).map(m =>
      ("k", ts(m), 900.0 + (m % 3) * 0.1)) :+ (("k", ts(30), -999.0))
    val out = Anomaly.zscoreFlags(rows.toDF("k", "ts", "v"),
      "k", "ts", "v", rangeSeconds = 3600, minHist = 12).collect()
    assert(out.length == 1 && out(0).getDouble(2) == -999.0)
  }
}
