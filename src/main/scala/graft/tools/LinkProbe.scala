package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalLinkIndex

/** CLI point probe against an ingest-time link index: who links to
  * these pages, and what do they call them — with the touched-bucket
  * read timed against the full-scan EQUIVALENT (the partition-pruning
  * proof at any corpus size). The baseline applies the SAME URL
  * canonicalization and committed-epoch fence the probe does, so the
  * two paths answer the identical question — their row counts are
  * asserted equal before any speedup is reported (r13 ADVICE: a
  * non-canonical target or an uncommitted epoch must not skew the
  * comparison).
  *
  *   sbt "runMain graft.tools.LinkProbe <indexDir> <url> [url ...]"
  */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: LinkProbe <indexDir> <url> [url ...]")
    val dir = args.head
    val targets = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-linkprobe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cfg = IncrementalLinkIndex.Config(dir)
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      // the full-scan baseline: same canonical targets, same VIEW the
      // probe reads (generation ∪ remainder — not the raw epoch tree,
      // which is empty after compact+gc) — equivalent query, minus the
      // pruning
      val canon = IncrementalLinkIndex.canonicalTargets(spark, targets)
      def fullScan() = IncrementalLinkIndex.allLinks(spark, cfg)
        .filter(col("abs").isin(canon: _*))
      // warm both paths once (JIT/codegen), then report 3 reps
      IncrementalLinkIndex.inlinks(spark, cfg, targets).count()
      fullScan().count()
      val pruned = (1 to 3).map(_ =>
        time(IncrementalLinkIndex.inlinks(spark, cfg, targets).count()))
      val full = (1 to 3).map(_ => time(fullScan().count()))
      val prunedRows = pruned.head._1
      val fullRows = full.head._1
      require(prunedRows == fullRows,
        s"probe/baseline row-count divergence: pruned=$prunedRows " +
          s"full=$fullRows — the timed queries are not equivalent")
      println(f"[linkprobe] rows=$prunedRows (full-scan rows=$fullRows) " +
        f"pruned=${pruned.map(_._2).min}%.3fs full=${
          full.map(_._2).min}%.3fs (min of 3; ${targets.length} target urls)")
      IncrementalLinkIndex.inlinks(spark, cfg, targets)
        .groupBy("abs").agg(count(lit(1)).as("n_in"),
          array_join(array_sort(collect_set(col("text"))), "|")
            .as("anchor_texts"))
        .orderBy("abs")
        .show(targets.length, truncate = false)
    } finally spark.stop()
  }
}
