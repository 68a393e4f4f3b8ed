package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AsOf, Sessionize}

class TimeSeriesSpec extends SparkSpec {

  test("asof join attaches newest right row at or before left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 10L))
      .toDF("k", "ts")
    val right = Seq((1L, 8L, "a"), (1L, 20L, "b"), (1L, 25L, "c"),
      (3L, 1L, "z")).toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts",
        Map("v" -> "v_asof"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(out.toSeq == Seq(
      (1L, 5L, None),          // nothing at or before 5
      (1L, 10L, Some("a")),    // 8 <= 10
      (1L, 20L, Some("b")),    // equal ts matches
      (2L, 10L, None)))        // key with no right rows
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    import spark.implicits._
    val ts = Seq(0L, 100L, 2000L, 2100L, 10000L)
      .map(s => new java.sql.Timestamp(s * 1000))
    val df = ts.zipWithIndex
      .map { case (t, i) => (7L, t, i.toLong, 1.0) }
      .toDF("user_id", "ts", "event_id", "value")
    val sessions = Sessionize.assignSessions(df, Seq("user_id"), "ts",
        gapSeconds = 1800L, tieBreak = Seq("event_id"))
      .orderBy("event_id").select("session_idx").collect().map(_.getLong(0))
    assert(sessions.toSeq == Seq(0L, 0L, 1L, 1L, 2L))
  }

  test("approx_count_distinct within 10% of exact on events") {
    val ev = Tables.table(spark, sf, "events")
    val exact = ev.select(countDistinct("user_id")).collect()(0).getLong(0)
    val approx = ev.select(approx_count_distinct("user_id"))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("daily HLL sketches merge to the global estimate") {
    val ev = Tables.table(spark, sf, "events")
    val daily = ev.groupBy(col("ts").cast("date").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val exact = ev.select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.1,
      s"merged=$merged exact=$exact")
  }
}
