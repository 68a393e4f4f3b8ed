package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.functions.{Html, Urls}
import graft.streaming.IncrementalLinkIndex

/** Random-crawl fuzz for the ingest-time link index: arbitrary tiny
  * corpora (pages with 0-3 anchors — corpus-internal, external,
  * root-relative, duplicate), arbitrary epoch splits — the index
  * probes must equal a DIRECT computation over the union crawl
  * (same extraction path, no index), regardless of how the pages were
  * partitioned into epochs. Covers what the fixture parity spec
  * cannot: zero-anchor pages (RANKED with n_links = 0 since r14, both
  * legs), external-only pages, multi-edges, and epoch layouts where
  * every link crosses an epoch boundary — for rank, HITS, and domain
  * rank alike. */
class LinkIndexProps extends SparkSpec {
  import spark.implicits._

  private def urlOf(i: Long) = s"https://s${i % 3}.example.com/p/$i"

  // a page: (id, anchors as raw hrefs) — href forms: corpus-absolute,
  // external, root-relative (resolves to a corpus url only when the
  // same host serves that path), duplicate of the first anchor
  private val pageGen: Gen[(Long, List[String])] = for {
    id <- Gen.choose(0L, 7L)
    n <- Gen.choose(0, 3)
    hrefs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(0L, 7L).map(urlOf),
      Gen.const("https://elsewhere.org/x"),
      Gen.choose(0L, 7L).map(i => s"/p/$i")))
  } yield (id, hrefs)

  private val crawlGen: Gen[(List[(Long, List[String])], Int)] = for {
    nPages <- Gen.choose(1, 6)
    pages <- Gen.listOfN(nPages, pageGen)
    dedup = pages.groupBy(_._1).map(_._2.head).toList // unique ids
    nEpochs <- Gen.choose(1, 3)
  } yield (dedup, nEpochs)

  private def pagesDf(pages: List[(Long, List[String])]) =
    pages.map { case (id, hrefs) =>
      val anchors = hrefs.zipWithIndex.map { case (h, i) =>
        s"""<a href="$h">t$id-$i</a>""" }.mkString(" ")
      (id, urlOf(id), s"<p>body $id</p>$anchors")
    }.toDF("doc_id", "url", "html")

  /** The index-free reference: same extraction over the union crawl. */
  private def directResolved(pages: List[(Long, List[String])]) = {
    val df = pagesDf(pages)
    val urlmap = df.select(Urls.normalize(col("url")).as("u"),
      col("doc_id").as("dst"))
    df.select(col("doc_id").as("src"), col("url"),
        explode(Html.anchors(col("html"))).as("a"))
      .select(col("src"),
        Urls.normalize(Urls.resolve(col("url"), col("a.href"))).as("abs"),
        col("a.text").as("text"))
      .join(urlmap, col("abs") === col("u"), "left")
      .select("src", "abs", "text", "dst")
  }

  test("index probes == direct union computation for random crawls and epoch splits") {
    val prop = Prop.forAll(crawlGen) { case (pages, nEpochs) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-linkfuzz").toString
      val cfg = IncrementalLinkIndex.Config(s"$tmp/idx", hashBuckets = 4)
      val df = pagesDf(pages)
      (0 until nEpochs).foreach { e =>
        IncrementalLinkIndex.ingestBatch(cfg,
          df.filter(pmod(col("doc_id"), lit(nEpochs)) === e),
          "doc_id", "url", "html", e.toLong)
      }
      val direct = directResolved(pages)

      val gotRes = IncrementalLinkIndex.resolved(spark, cfg)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val wantRes = direct
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
        .groupBy(identity).view.mapValues(_.length).toMap

      val gotAnch = IncrementalLinkIndex.anchors(spark, cfg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      val wantAnch = direct.filter(col("dst").isNotNull)
        .groupBy(col("dst").as("doc_id"))
        .agg(count(lit(1)).as("n_in"),
          countDistinct(col("src")).as("n_srcs"),
          array_join(array_sort(collect_list(col("text"))), "|")
            .as("texts"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet

      // rank: compare against pageRank run directly on the same
      // edges/nodes (the index must hand the IDENTICAL graph over);
      // LEFT join + coalesce — zero-anchor pages keep their rank row
      // with n_links = n_out = 0 (the r14 contract, both legs)
      val gotRank = IncrementalLinkIndex.rank(spark, cfg, iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val counts = direct.groupBy("src").agg(
          count(lit(1)).as("n_links"), count(col("dst")).as("n_out"))
        .withColumnRenamed("src", "doc_id")
      val directEdges = direct.filter(col("dst").isNotNull)
        .select("src", "dst")
      val wantRank = graft.operators.Graphs.pageRank(
          directEdges,
          "src", "dst", df.select("doc_id"), "doc_id", iters = 2)
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_links"), lit(0L)).as("n_links"),
          coalesce(col("n_out"), lit(0L)).as("n_out"),
          col("rank_fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet

      // r14 probe parity, fuzzed: HITS and domain rank off the index
      // must equal the direct recurrences over the same union graph
      val gotHits = IncrementalLinkIndex.hits(spark, cfg, iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val wantHits = graft.operators.Graphs.hits(
          directEdges, "src", "dst", df.select("doc_id"), "doc_id",
          iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val gotDom = IncrementalLinkIndex.domainRank(spark, cfg, iters = 2)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val srcUrls = df.select(col("doc_id").as("src"),
        Urls.normalize(col("url")).as("src_url"))
      val domEdges = direct.filter(col("dst").isNotNull)
        .join(srcUrls, Seq("src"))
        .select(Urls.registeredDomain(col("src_url")).as("src"),
          Urls.registeredDomain(col("abs")).as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val domNodes = df.select(
        Urls.registeredDomain(Urls.normalize(col("url"))).as("domain"))
        .distinct()
      val wantDom = graft.operators.Graphs.pageRank(
          domEdges, "src", "dst", domNodes, "domain", iters = 2,
          weightCol = Some("w"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet

      (gotRes == wantRes) :| s"resolved mismatch: $gotRes vs $wantRes" &&
        (gotAnch == wantAnch) :| s"anchors mismatch: $gotAnch vs $wantAnch" &&
        (gotRank == wantRank) :| s"rank mismatch: $gotRank vs $wantRank" &&
        (gotHits == wantHits) :| s"hits mismatch: $gotHits vs $wantHits" &&
        (gotDom == wantDom) :| s"domain mismatch: $gotDom vs $wantDom"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
