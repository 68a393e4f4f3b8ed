package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.SketchRollupSink
import graft.functions.expressions.KllAggregate._

/** Streaming merge-rollup == one-shot batch aggregation; epochs merge
  * (never replace); replay cannot double-merge. */
class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  private val tableSchema = StructType(Seq(
    StructField("event_type", StringType),
    StructField("day", DateType),
    StructField("sk", BinaryType),
    StructField("n", LongType)))

  private def mkSink(dir: String) = new SketchRollupSink(
    spark, dir, keyCols = Seq("event_type", "day"), tableSchema,
    numBuckets = 8,
    epochAgg = b => b
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(kll_sketch_agg(col("value")).as("sk"), count(lit(1)).as("n")),
    mergeExprs = Seq(kll_merge_agg(col("sk")).as("sk"),
      sum(col("n")).as("n")))

  test("epochs merge into stored rows; final table == batch aggregation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    val ev = graft.core.Tables.table(spark, sf, "events")
      .select("event_type", "ts", "value", "event_id")
    val sink = mkSink(s"$tmp/t")
    // three epochs split by event_id — every epoch touches every key,
    // so merging (not replacing) is load-bearing
    (0 until 3).foreach { e =>
      sink.applyBatch(ev.filter(col("event_id") % 3 === e), e.toLong)
    }
    val table = sink.currentState()
    val want = ev.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    // counts merge exactly
    val got = table.select(col("event_type"), col("day"), col("n"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // sketches merged across epochs answer rank queries over ALL epochs:
    // per-type p50 from the table's unioned sketches lands at true rank
    val merged = table.groupBy("event_type")
      .agg(kll_quantiles(kll_merge_agg(col("sk")), Seq(0.5)).as("q"))
      .select(col("event_type"), col("q")(0).as("p50"))
      .as[(String, Double)].collect()
    val all = ev.select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    merged.foreach { case (et, p50) =>
      val xs = all(et)
      val rank = xs.count(_ <= p50).toDouble / xs.length
      assert(math.abs(rank - 0.5) <= 0.04, s"$et p50 at rank $rank")
    }
    // replaying an applied epoch is SKIPPED via the committed #epoch
    // marker (merge-by-add is not idempotent) — counts unchanged
    sink.applyBatch(ev.filter(col("event_id") % 3 === 1), 1L)
    val again = sink.currentState().select("event_type", "day", "n")
    assert(again.except(want).isEmpty && want.except(again).isEmpty)
    assert(sink.lastAppliedEpoch().contains(2L))
  }

  test("theta sketches stream through the same generic rollup: " +
      "exact-regime distinct counts across epochs") {
    // zero new sink code — theta_sketch_agg/theta_union_agg plug into
    // the caller-supplied epochAgg/mergeExprs slots, and in the exact
    // regime the continuously-merged table answers distinct-user
    // queries EXACTLY across all epochs
    val tmp = java.nio.file.Files.createTempDirectory("graft-throll")
      .toString
    val ev = graft.core.Tables.table(spark, sf, "events")
      .select("event_type", "ts", "user_id", "event_id")
    val schema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("day", DateType),
      StructField("sk", BinaryType)))
    val sink = new SketchRollupSink(
      spark, s"$tmp/t", keyCols = Seq("event_type", "day"), schema,
      numBuckets = 8,
      epochAgg = b => b
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(theta_sketch_agg(col("user_id"), 14).as("sk")),
      mergeExprs = Seq(theta_union_agg(col("sk"), 14).as("sk")))
    (0 until 3).foreach { e =>
      sink.applyBatch(ev.filter(col("event_id") % 3 === e), e.toLong)
    }
    val got = sink.currentState().groupBy("event_type")
      .agg(theta_sketch_estimate(theta_union_agg(col("sk"), 14)).as("n"))
      .as[(String, Long)].collect().toMap
    val want = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want, s"got $got want $want")
  }
}
