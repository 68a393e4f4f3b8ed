package graft

import org.apache.spark.sql.functions._
import graft.streaming.IncrementalLinkIndex
import graft.queries.CurationOps

/** Ingest-time link index probes == the batch link operators on the
  * union corpus, EXACTLY (same extraction, same integer rank
  * recurrence); epochs idempotent; point probe partition-pruned. */
class IncrementalLinkSpec extends SparkSpec {

  private lazy val docs = graft.core.Tables.table(spark, sf, "documents")
    .select("doc_id", "text")

  private def built(tmp: String): IncrementalLinkIndex.Config = {
    val cfg = IncrementalLinkIndex.Config(s"$tmp/index", hashBuckets = 16)
    val n = docs.count()
    val pages = CurationOps.crawlPages(docs, n, withText = true)
    (0 until 3).foreach { e =>
      IncrementalLinkIndex.ingestBatch(cfg,
        pages.filter(pmod(col("doc_id"), lit(3)) === e),
        "doc_id", "url", "html", e.toLong)
    }
    cfg
  }

  test("rank probe == batch web_link_pipeline; anchors == batch link_anchor_texts; replay no-op") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-link").toString
    val cfg = built(tmp)

    val wantRank = graft.SparkEntry.queries("web_link_pipeline")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val gotRank = IncrementalLinkIndex.rank(spark, cfg, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(gotRank == wantRank,
      s"rank != batch: ${gotRank.diff(wantRank).take(3)} / ${
        wantRank.diff(gotRank).take(3)}")

    val wantAnch = graft.SparkEntry.queries("link_anchor_texts")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val gotAnch = IncrementalLinkIndex.anchors(spark, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(gotAnch == wantAnch,
      s"anchors != batch: ${gotAnch.diff(wantAnch).take(3)} / ${
        wantAnch.diff(gotAnch).take(3)}")

    // replaying a landed epoch is a no-op (stats marker)
    val n = docs.count()
    IncrementalLinkIndex.ingestBatch(cfg,
      CurationOps.crawlPages(docs, n, withText = true)
        .filter(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "url", "html", 1L)
    val again = IncrementalLinkIndex.anchors(spark, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(again == wantAnch, "replay changed the index")
  }

  test("point in-link probe: correct vs full resolution, and reads only touched buckets") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-link2").toString
    val cfg = built(tmp)

    // two real corpus page urls (one of each domain family)
    val targets = Seq(
      "https://news.example.com/articles/item-0",
      "https://blog.sample.org/articles/item-1")
    val got = IncrementalLinkIndex.inlinks(spark, cfg, targets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    val want = IncrementalLinkIndex.resolved(spark, cfg)
      .filter(col("abs").isin(targets: _*))
      .select("abs", "src", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == want, s"inlinks mismatch: ${got.diff(want).take(3)}")
    assert(got.nonEmpty, "fixture should have in-links for item-0/item-1")

    // partition-pruned: the scan carries a b_mod partition filter and
    // the executed read touches fewer files than the full bucket set
    // (inputFiles lists the UNpruned relation, so assert on the plan +
    // the numFiles metric instead)
    val prior = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = IncrementalLinkIndex.inlinks(spark, cfg, targets)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      assert(scan.partitionFilters.map(_.toString).mkString
        .contains("b_mod"), s"no b_mod partition filter in ${
          scan.partitionFilters}")
      val readFiles = scan.metrics("numFiles").value
      val allFiles = df.sparkSession.read
        .parquet(s"${cfg.dir}/links").inputFiles.length
      assert(readFiles > 0 && readFiles < allFiles,
        s"probe read $readFiles of $allFiles files — pruning did nothing")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("zero-anchor corpus: probes return empty, never schema-inference errors") {
    // every page linkless -> the partitioned links write lands no
    // parquet data files; probes must degrade to empty (fuzz-found r13)
    val tmp = java.nio.file.Files.createTempDirectory("graft-link0").toString
    val cfg = IncrementalLinkIndex.Config(s"$tmp/index", hashBuckets = 4)
    import spark.implicits._
    val pages = Seq((1L, "https://a.example.com/p1", "<p>no links</p>"))
      .toDF("doc_id", "url", "html")
    IncrementalLinkIndex.ingestBatch(cfg, pages, "doc_id", "url", "html", 0L)
    assert(IncrementalLinkIndex.resolved(spark, cfg).count() == 0)
    assert(IncrementalLinkIndex.anchors(spark, cfg).count() == 0)
    assert(IncrementalLinkIndex.rank(spark, cfg).count() == 0)
    assert(IncrementalLinkIndex.inlinks(spark, cfg,
      Seq("https://a.example.com/p1")).count() == 0)
  }

  test("probes refuse an empty index loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-link3").toString
    val cfg = IncrementalLinkIndex.Config(s"$tmp/none")
    intercept[IllegalArgumentException] {
      IncrementalLinkIndex.rank(spark, cfg)
    }
    intercept[IllegalArgumentException] {
      IncrementalLinkIndex.inlinks(spark, cfg, Seq("https://x.example/"))
    }
  }
}
