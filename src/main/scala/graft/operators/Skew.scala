package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys at scale.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE); these
  * helpers cover the two places AQE can't:
  *
  *   - aggregations whose per-key state is large (collect_list-style or
  *     high-cardinality distinct counts) → two-phase salted aggregation;
  *   - broadcast-impossible joins against a known-hot key set → salted
  *     replication join.
  */
object Skew {

  /** Two-phase salted aggregation for associative aggregates: phase 1
    * aggregates on (key, salt) — spreading a hot key over `buckets`
    * reducers — phase 2 merges the partials per key. The caller supplies
    * the per-phase aggregate pairs: (partialAgg, mergeAgg) must satisfy
    * merge(partial(rows)) == agg(rows) (true for sum/count/min/max).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partial: Seq[(String, Column)],
                merge: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head._2.as(merge.head._1),
        merge.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Convenience: salted sum/count (the common hot-key shape). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets,
      partial = Seq("__psum" -> sum(col(valueCol)), "__pcnt" -> count(lit(1))),
      merge = Seq("total" -> sum(col("__psum")), "n" -> sum(col("__pcnt"))))

  /** Salted join for a shuffle join whose LEFT side has hot keys: left
    * rows get a random-ish salt in [0, buckets); the right side is
    * replicated `buckets`× with every salt value. Correct for any join
    * whose condition is key equality; costs |right| × buckets — use for
    * moderate right sides that are still too big to broadcast.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer would emit each unmatched right row once PER SALT
    // REPLICA (buckets copies); only left-preserving joins are sound here
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
      .contains(joinType.toLowerCase),
      s"saltedJoin replicates the right side; '$joinType' would duplicate " +
      "unmatched right rows (use a right-salted variant instead)")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()),
        lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Mirror of `saltedJoin` for a shuffle join whose RIGHT side has hot
    * keys: right rows get the salt, the LEFT side is replicated
    * `buckets`×. Sound only for right-preserving joins (inner/right/
    * cross) — a left/full outer here would emit each unmatched LEFT row
    * once per replica. Costs |left| × buckets.
    */
  def rightSaltedJoin(left: DataFrame, right: DataFrame, key: String,
                      buckets: Int = 8,
                      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "right", "right_outer", "rightouter", "cross")
      .contains(joinType.toLowerCase),
      s"rightSaltedJoin replicates the left side; '$joinType' would " +
      "duplicate unmatched left rows (use saltedJoin for left-preserving joins)")
    val saltedRight = right.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()),
        lit(buckets)))
    val replicatedLeft = left.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    replicatedLeft.join(saltedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
