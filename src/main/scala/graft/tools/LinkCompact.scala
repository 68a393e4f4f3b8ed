package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.IncrementalLinkIndex

/** Table-maintenance CLI for an ingest-time link index: fold every
  * committed epoch (and any prior generation) into one compaction
  * generation, optionally reclaim the superseded files, and report the
  * file-count collapse — with the rank probe timed before and after so
  * the maintenance win is measured, not asserted.
  *
  *   sbt "runMain graft.tools.LinkCompact <indexDir> [--gc]"
  */
object LinkCompact {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LinkCompact <indexDir> [--gc]")
    val dir = args.head
    val runGc = args.contains("--gc")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-linkcompact")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cfg = IncrementalLinkIndex.Config(dir)
      def dataFiles(sub: String): Int = {
        val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
        val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!f.exists(p)) return 0
        val it = f.listFiles(p, true)
        var n = 0
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith(".")) n += 1
        }
        n
      }
      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val filesBefore = dataFiles("links") + dataFiles("links-compact") +
        dataFiles("urls") + dataFiles("urls-compact")
      IncrementalLinkIndex.rank(spark, cfg).count() // warm
      val (_, tBefore) =
        time(IncrementalLinkIndex.rank(spark, cfg).count())
      val stats = IncrementalLinkIndex.compact(spark, cfg).getOrElse {
        println("[linkcompact] nothing to fold (already compacted)")
        spark.stop(); return
      }
      if (runGc) IncrementalLinkIndex.gc(spark, cfg, graceMs = 0L)
      val filesAfter = dataFiles("links") + dataFiles("links-compact") +
        dataFiles("urls") + dataFiles("urls-compact")
      IncrementalLinkIndex.rank(spark, cfg).count() // warm the new view
      val (_, tAfter) =
        time(IncrementalLinkIndex.rank(spark, cfg).count())
      println(f"[linkcompact] gen=${stats.gen} folded=${
        stats.foldedEpochs.size} epochs linkRows=${stats.linkRows} " +
        f"urlRows=${stats.urlRows} files=$filesBefore->$filesAfter " +
        f"(gc=$runGc) rank_probe=${tBefore}%.3fs->${tAfter}%.3fs")
    } finally spark.stop()
  }
}
