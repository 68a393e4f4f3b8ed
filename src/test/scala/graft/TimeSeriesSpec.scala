package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AsOf, Sessionize}

class TimeSeriesSpec extends SparkSpec {

  test("funnel: strict step ordering, conversion window, boundary inclusive") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // u1 converts fully; u2's click precedes its view (must not count);
    // u3's purchase lands exactly AT the window edge (inclusive); u4's
    // purchase is 1 s past the window (excluded)
    val w = 100L
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      (2L, "click", 0L), (2L, "view", 10L), (2L, "purchase", 20L),
      (3L, "view", 0L), (3L, "click", 1L), (3L, "purchase", w),
      (4L, "view", 0L), (4L, "click", 1L), (4L, "purchase", w + 1))
      .map { case (u, et, s) => (u, et, t(s)) }
      .toDF("user_id", "event_type", "ts")
    val out = graft.operators.Funnel.conversion(ev, "user_id",
      "event_type", "ts", Seq("view", "click", "purchase"), w)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // u2 has no click after its view within w? view at 10, no later
    // click — so step2 = {1,3,4}; step3 = {1,3} (u4 past window)
    assert(out.toSeq == Seq((1, "view", 4L), (2, "click", 3L),
      (3, "purchase", 2L)), out.mkString(", "))
    // counts are monotone non-increasing by construction
    assert(out.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("cohortRetention: offset 0 == cohort size; no negative offsets") {
    val ev = Tables.table(spark, sf, "events")
    val m = graft.operators.Funnel.cohortRetention(ev, "user_id", "ts")
    val rows = m.collect()
    assert(rows.forall(_.getAs[Int]("day_offset") >= 0))
    val day0 = m.filter(col("day_offset") === 0)
      .select("cohort_day", "n_users")
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("ts").cast("date")).as("cohort_day"))
      .groupBy("cohort_day").agg(count(lit(1)).as("n_users"))
    assert(day0.except(cohorts).isEmpty && cohorts.except(day0).isEmpty)
    // no window operator anywhere (user-partitioned aggs + joins only)
    assert(!m.queryExecution.executedPlan.toString.contains("Window"))
  }

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
