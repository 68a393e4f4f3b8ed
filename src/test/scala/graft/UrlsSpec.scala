package graft

import org.apache.spark.sql.functions._
import graft.functions.Urls
import graft.operators.SpanDedup

/** URL curation primitives + cross-document paragraph dedup (r11). */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def one(url: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(url).toDF("u").select(c(col("u")).cast("string").as("r"))
      .as[String].collect()(0)

  test("host: lowercased, userinfo/port stripped") {
    assert(one("HTTPS://User:pw@News.Example.COM:8443/A/b?q=1",
      Urls.host) == "news.example.com")
  }

  test("normalize: tracking params, fragment, trailing slash") {
    assert(one("https://Ex.Com/path/?utm_source=x&keep=1&ref=rss#frag",
      Urls.normalize) == "https://ex.com/path/?keep=1")
    assert(one("https://ex.com/path/sub/", Urls.normalize) ==
      "https://ex.com/path/sub")
    // ALL params tracking → the dangling '?' goes too
    assert(one("https://ex.com/p?utm_campaign=a&fbclid=b",
      Urls.normalize) == "https://ex.com/p")
    // root slash survives
    assert(one("https://ex.com/", Urls.normalize) == "https://ex.com/")
    // path case is preserved (only scheme+host lowercase)
    assert(one("https://EX.com/CaseSensitive", Urls.normalize) ==
      "https://ex.com/CaseSensitive")
  }

  test("registeredDomain: plain TLD, ccTLD second-level, bare domain") {
    assert(one("https://a.b.news.example.com/x",
      Urls.registeredDomain) == "example.com")
    assert(one("https://shop.example.co.uk/x",
      Urls.registeredDomain) == "example.co.uk")
    assert(one("https://sample.io/x", Urls.registeredDomain) == "sample.io")
    assert(one("https://docs.sample.io/x",
      Urls.registeredDomain) == "sample.io")
  }

  test("blocked: registered-domain membership") {
    assert(one("https://x.tracker.net/p",
      u => Urls.blocked(u, Seq("tracker.net"))) == "true")
    assert(one("https://nettracker.net/p",
      u => Urls.blocked(u, Seq("tracker.net"))) == "false")
  }

  test("removeDupParagraphs: first occurrence wins, docs rebuilt in order") {
    val docs = Seq(
      (1L, "alpha beta\nshared banner line\ngamma delta"),
      (2L, "shared banner line\nunique two\nshared banner line"),
      (3L, "unique three\n\nshared banner line")).toDF("doc_id", "text")
    val out = SpanDedup.removeDupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 3L, 3L, "alpha beta\nshared banner line\ngamma delta")))
    // doc 2: both banner copies dropped (cross-doc AND within-doc)
    assert(out(1) == ((2L, 3L, 1L, "unique two")))
    // doc 3: blank paragraph not counted; banner dropped
    assert(out(2) == ((3L, 2L, 1L, "unique three")))
  }

  test("removeDupParagraphs: blank/empty docs keep a 0/0 row") {
    val docs = Seq((1L, "only para"), (2L, ""), (3L, "\n\n"))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeDupParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(1) == ((2L, 0L, 0L, "")))
    assert(out(2) == ((3L, 0L, 0L, "")))
  }

  test("registry transforms: url_filter blocklist+dedup, paragraph_dedup") {
    val df = Seq(
      (1L, "https://a.example.com/x?utm_source=s", "keep one\nbanner"),
      (2L, "https://A.Example.com/x", "banner\nkeep two"),
      (3L, "https://bad.tracker.net/y", "spam text"))
      .toDF("doc_id", "url", "text")
    val filtered = graft.pipeline.Registry.transforms("url_filter")(
      Map("blocklist" -> Seq("tracker.net"), "dedup" -> "true"))(df)
    // 3 blocked; 1 and 2 normalize to the same URL → lowest id kept
    assert(filtered.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val paras = graft.pipeline.Registry.transforms("paragraph_dedup")(
      Map())(df)
    val byId = paras.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(byId(1L) == "keep one\nbanner" && byId(2L) == "keep two")
  }
}
