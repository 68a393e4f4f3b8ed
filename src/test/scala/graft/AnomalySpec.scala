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
}
