package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalLinkIndex

/** Build an N-epoch link index from a fixture dir's `documents` table
  * (the synthetic crawl fixture) — the admin/demo counterpart of the
  * `link-index` sink for driving [[LinkCompact]] / [[LinkProbe]] at any
  * scale rung without a streaming config.
  *
  *   sbt "runMain graft.tools.LinkIngest <sfDir> <indexDir> [epochs=12]"
  */
object LinkIngest {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: LinkIngest <sfDir> <indexDir> [epochs]")
    val (sfDir, idxDir) = (args(0), args(1))
    val epochs = if (args.length > 2) args(2).toInt else 12
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-linkingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val d = graft.core.Tables.table(spark, sfDir, "documents")
        .select("doc_id", "text")
      val n = d.count()
      val pages = graft.queries.CurationOps.crawlPages(d, n,
        withText = true)
      val cfg = IncrementalLinkIndex.Config(idxDir)
      val t0 = System.nanoTime()
      (0 until epochs).foreach { e =>
        IncrementalLinkIndex.ingestBatch(cfg,
          pages.filter(pmod(col("doc_id"), lit(epochs)) === e),
          "doc_id", "url", "html", e.toLong)
      }
      println(f"[linkingest] $epochs epochs of $n pages into $idxDir " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    } finally spark.stop()
  }
}
