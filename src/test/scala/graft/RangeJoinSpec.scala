package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sessionize
import graft.plans.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("custom sweep range join == built-in join+filter on the fixture") {
    val ev = Tables.table(spark, sf, "events")
      .select("event_id", "user_id", "ts")
    val sessions = Sessionize.sessionStats(
      Tables.table(spark, sf, "events")
        .select("user_id", "ts", "event_id", "value"),
      Seq("user_id"), "ts", gapSeconds = 1800L, valueCol = "value",
      tieBreak = Seq("event_id"))
      .select("user_id", "session_idx", "session_start", "session_end")
    val custom = RangeJoin.rangeJoin(ev, sessions, Seq("user_id"),
        "ts", "session_start", "session_end",
        Map("session_idx" -> "session_idx"))
      .select("event_id", "session_idx")
      .as[(Long, Long)].collect().sorted
    val builtin = ev.join(sessions,
        ev("user_id") === sessions("user_id") &&
          ev("ts") >= sessions("session_start") &&
          ev("ts") <= sessions("session_end"))
      .select("event_id", "session_idx")
      .as[(Long, Long)].collect().sorted
    assert(custom.length == builtin.length && custom.nonEmpty)
    assert(custom.toSeq == builtin.toSeq)
    // every event belongs to exactly one session
    assert(custom.length == ev.count())
  }

  test("overlapping ranges emit one row per overlap; values not aliased") {
    val points = Seq((1L, "a", 50L), (2L, "a", 150L), (3L, "b", 10L))
      .toDF("pid", "k", "ts")
    val ranges = Seq(
      ("a", 0L, 100L, "r1"), ("a", 40L, 200L, "r2"), ("a", 160L, 300L, "r3"),
      ("b", 0L, 5L, "r4"))
      .toDF("k", "lo", "hi", "tag")
    val got = RangeJoin.rangeJoin(points, ranges, Seq("k"),
        "ts", "lo", "hi", Map("tag" -> "tag", "lo" -> "range_lo"))
      .select("pid", "tag", "range_lo")
      .as[(Long, String, Long)].collect().toSet
    // point 1 (ts=50) overlaps r1 and r2 — DISTINCT tags prove the
    // emitted rows are copies, not aliases of the last match
    assert(got == Set((1L, "r1", 0L), (1L, "r2", 40L), (2L, "r2", 40L)))
  }

  test("null ts/lo/hi never match; empty sides are fine") {
    val points = Seq((1L, "a", Some(50L)), (2L, "a", None))
      .toDF("pid", "k", "ts")
    val ranges = Seq(
      ("a", Some(0L), Some(100L), "ok"),
      ("a", None, Some(100L), "nullLo"),
      ("a", Some(0L), None, "nullHi"))
      .toDF("k", "lo", "hi", "tag")
    val got = RangeJoin.rangeJoin(points, ranges, Seq("k"),
        "ts", "lo", "hi", Map("tag" -> "tag"))
      .select("pid", "tag").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "ok")))
    val empty = RangeJoin.rangeJoin(points.limit(0), ranges, Seq("k"),
      "ts", "lo", "hi", Map("tag" -> "tag"))
    assert(empty.count() == 0)
  }

  test("deep overlap on one key: heap-pruned active set completes and is exact") {
    // 10k ranges ALL overlapping [0, 20000] on a single key plus 2k
    // points — active set is ~10k deep at every point. With the linear
    // prune this is O(points × active) scans; the heap keeps pruning
    // O(log a). Counts verified against the closed form.
    val ranges = spark.range(10000)
      .select(lit("hot").as("k"), col("id").as("lo"),
        (lit(20000L) + col("id")).as("hi"), col("id").as("rid"))
    val points = spark.range(2000)
      .select(lit("hot").as("k"), (col("id") * 10 + 5).as("ts"),
        col("id").as("pid"))
    val got = RangeJoin.rangeJoin(points, ranges, Seq("k"),
      "ts", "lo", "hi", Map("rid" -> "rid"))
    // point ts matches ranges with lo <= ts (hi is always >= 20000 > ts):
    // count = sum over points of min(ts+1, 10000)
    val want = (0L until 2000L).map(p => math.min(p * 10 + 5 + 1, 10000L)).sum
    assert(got.count() == want)
    // spot-check one point's match set
    val p7 = got.filter(col("pid") === 7).select("rid")
      .as[Long].collect().toSet
    assert(p7 == (0L to 75L).toSet)
  }

  test("plan uses RangeJoinExec with clustered+sorted children, no BNLJ") {
    val ev = Tables.table(spark, sf, "events").select("event_id", "user_id", "ts")
    val ranges = Tables.table(spark, sf, "events")
      .groupBy("user_id").agg(min("ts").as("lo"), max("ts").as("hi"))
    val df = RangeJoin.rangeJoin(ev, ranges, Seq("user_id"),
      "ts", "lo", "hi", Map("lo" -> "window_lo"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin "), plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
  }
}
