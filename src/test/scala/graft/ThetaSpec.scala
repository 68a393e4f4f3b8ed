package graft

import org.apache.spark.sql.functions._

/** The native Spark 4 theta-sketch family (theta_sketch_agg /
  * theta_union_agg / theta_intersection / theta_difference /
  * theta_sketch_estimate) pinned to the properties the
  * `theta_user_overlap` oracle depends on: estimates are EXACT distinct
  * counts while retained entries stay under the nominal 2^lgK, and set
  * operations in that regime are exact set algebra — the
  * kll_exact_quantiles pattern applied to sets. */
class ThetaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = graft.core.Tables.table(spark, sf, "events")
    .select(col("event_type"), col("ts"), col("user_id"))

  test("exact regime: estimates are exact distinct counts, through merge") {
    val lgK = 14 // >> 15 users at sf0.001
    val got = ev
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(theta_sketch_agg(col("user_id"), lgK).as("sk"))
      .groupBy("event_type")
      .agg(theta_sketch_estimate(theta_union_agg(col("sk"), lgK)).as("est"))
      .as[(String, Long)].collect().toMap
    val want = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want, s"got $got want $want")
  }

  test("set operations == exact set algebra in the exact regime") {
    val a = ev.filter(col("event_type") === "click")
    val b = ev.filter(col("event_type") === "purchase")
    val sa = a.agg(theta_sketch_agg(col("user_id"), 14).as("s"))
      .withColumn("j", lit(1))
    val sb = b.agg(theta_sketch_agg(col("user_id"), 14).as("t"))
      .withColumn("j", lit(1))
    val row = sa.join(sb, "j")
      .select(
        theta_sketch_estimate(theta_intersection(col("s"), col("t")))
          .as("both"),
        theta_sketch_estimate(theta_difference(col("s"), col("t")))
          .as("only"))
      .head()
    val ua = a.select("user_id").as[Long].collect().toSet
    val ub = b.select("user_id").as[Long].collect().toSet
    assert(row.getLong(0) == ua.intersect(ub).size.toLong)
    assert(row.getLong(1) == ua.diff(ub).size.toLong)
  }

  test("estimates are layout-independent") {
    def est(parts: Int): Long =
      ev.repartition(parts)
        .agg(theta_sketch_estimate(
          theta_sketch_agg(col("user_id"), 12)).as("e"))
        .head().getLong(0)
    assert(est(1) == est(8))
  }

  test("estimate regime: published error bound at tiny lgK") {
    // nominal 16 entries against 2000 distinct values: sampling is
    // genuinely active; rse ~ 1/sqrt(k-1) ~ 26%, allow 4 sigma
    val n = 2000
    val est = (1 to n).map(_.toLong).toDF("v")
      .agg(theta_sketch_estimate(theta_sketch_agg(col("v"), 4)).as("e"))
      .head().getLong(0).toDouble
    assert(math.abs(est - n) / n < 1.04, s"estimate $est for $n")
    assert(est > 0)
  }

  test("bitmap rollup == exact distinct counts (the exact family member)") {
    val got = ev.select(col("event_type"),
      bitmap_bucket_number(col("user_id")).as("bkt"),
      bitmap_bit_position(col("user_id")).as("pos"))
      .groupBy("event_type", "bkt")
      .agg(bitmap_construct_agg(col("pos")).as("bm"))
      .groupBy("event_type")
      .agg(sum(bitmap_count(col("bm"))).as("n"))
      .as[(String, Long)].collect().toMap
    val want = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("null inputs are skipped; empty input estimates 0") {
    val e = Seq[Option[Long]](None, None).toDF("v")
      .agg(theta_sketch_estimate(theta_sketch_agg(col("v"))).as("e"))
      .head()
    assert(e.isNullAt(0) || e.getLong(0) == 0L)
  }
}
