package graft

import org.apache.spark.sql.functions._
import graft.functions.Html

/** HTML main-text extraction: block scoring, entity decode, the synth
  * round-trip the gate query relies on, and the registry transform. */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.mainText(col("h")).as("t"))
      .as[String].collect()(0)

  test("hrefs: every double-quoted anchor in document order") {
    def links(html: String): Seq[String] =
      Seq(html).toDF("h").select(Html.hrefs(col("h")).as("l"))
        .as[Seq[String]].collect()(0)
    assert(links(
      """<A HREF="/up">x</A> text <a class="k" href="https://e.org/a?q=1">y</a>
        |<a href="/dup">z</a><a href="/dup">z2</a> <p>no link</p>""".stripMargin)
      === Seq("/up", "https://e.org/a?q=1", "/dup", "/dup"))
    assert(links("<p>none</p>") === Seq.empty)
    // r13 fix: an attribute that merely ENDS in "href" must not donate
    // its value — the real href wins; an anchor with ONLY data-href
    // yields no edge
    assert(links("""<a data-href="wrong" href="/right">x</a>""")
      === Seq("/right"))
    assert(links("""<a data-href="only">x</a>""") === Seq.empty)
    // the synth fixture page: 3 nav + 1 const-para + 3 footer anchors
    val page = Seq((3L, "one two three")).toDF("id", "t")
      .select(Html.synthPage(col("id"), col("t")).as("h"))
      .as[String].collect()(0)
    assert(links(page) ===
      Seq("/", "/docs", "/about", "/deep", "/tos", "/privacy", "/contact"))
    // the related aside injects between content and footer
    val withRel = Seq((3L, "one two three")).toDF("id", "t")
      .select(Html.synthPage(col("id"), col("t"),
        related = lit("<aside><a href=\"https://x.io/9\">r</a></aside>\n"))
        .as("h")).as[String].collect()(0)
    assert(links(withRel) === Seq("/", "/docs", "/about", "/deep",
      "https://x.io/9", "/tos", "/privacy", "/contact"))
    // default `related` leaves the page byte-identical (pinned oracles)
    assert(withRel.replace(
      "<aside><a href=\"https://x.io/9\">r</a></aside>\n", "") === page)
  }

  test("anchors: (href, text) pairs with inner markup stripped") {
    def pairs(html: String): Seq[(String, String)] =
      Seq(html).toDF("h").select(Html.anchors(col("h")).as("a"))
        .as[Seq[(String, String)]].collect()(0)
    assert(pairs(
      """<a href="/x"><b>rel</b> 5-0</a> noise
        |<a class="c" href="https://e.org/y">plain  text
        |spanning</a> <a href="/unclosed">""".stripMargin)
      === Seq("/x" -> "rel 5-0", "https://e.org/y" -> "plain text spanning"))
    assert(pairs("<p>no anchors</p>") === Seq.empty)
    // r13 fix: delimiter required before the href attribute name
    assert(pairs("""<a data-href="wrong" href="/right">t</a>""")
      === Seq("/right" -> "t"))
  }

  test("boilerplate dies, content survives, tags strip, entities decode") {
    val page =
      """<html><head><title>T</title><style>b{c:1}</style>
        |<script>if (1 < 2) { alert("</p>"); }</script></head><body>
        |<nav><a href="/">Home</a> <a href="/x">Docs</a></nav>
        |<!-- a comment with <p>fake tags</p> inside -->
        |<div><p>The quick brown fox jumps over the lazy dog tonight.</p>
        |<p>A second paragraph with <b>bold</b> and an inline
        |<a href="/ref">reference link</a> inside a long sentence.</p>
        |<p>short</p>
        |<footer><a href="/tos">Terms of Service</a> ·
        |<a href="/priv">Privacy Policy</a></footer>
        |</div></body></html>""".stripMargin
    assert(extract(page) ==
      "The quick brown fox jumps over the lazy dog tonight.\n" +
        "A second paragraph with bold and an inline reference link " +
        "inside a long sentence.")
  }

  test("link density: an all-link block dies even when long") {
    val nav = "<div>" + (1 to 8).map(i =>
      s"""<a href="/$i">navigation entry number $i</a>""").mkString(" ") +
      "</div><p>genuine content sentence that is long enough here.</p>"
    assert(extract(nav) ==
      "genuine content sentence that is long enough here.")
  }

  test("entity decode order: escaped entity names survive one round-trip") {
    val r = Seq("x").toDF("x").select(
      Html.unescapeEntities(lit("&amp;lt; &lt; &gt; &quot; &#39; &amp;"))
        .as("t")).as[String].collect()(0)
    assert(r == "&lt; < > \" ' &")
  }

  test("synthPage round-trips: mainText == chunked raw text + const para") {
    val texts = Seq(
      "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen",   // 16 toks → 2 chunks
      "a b",                                   // short chunk → dropped
      "tokens with specials like a<b and x&y survive the escape roundtrip",
      "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        Html.mainText(Html.synthPage(col("doc_id"), col("text"))).as("t"),
        Html.keptCount(Html.synthPage(col("doc_id"), col("text"))).as("n"))
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    def expect(t: String): String = {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val chunks = toks.grouped(12).map(_.mkString(" "))
        .filter(_.length >= 20).toSeq
      (chunks :+ Html.constParaText).mkString("\n")
    }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i)._2 == expect(t), s"doc $i")
      assert(got(i)._3 == expect(t).split("\n").length, s"doc $i count")
    }
  }

  test("registry transform html_extract rewrites the text column") {
    val df = Seq((1L, "<p>a long enough genuine content sentence here.</p>" +
        "<nav><a href='/'>Home</a></nav>"))
      .toDF("doc_id", "html")
    val out = graft.pipeline.Registry.transforms("html_extract")(
      Map("html_col" -> "html"))(df)
    assert(out.columns.contains("text"))
    assert(out.select("text").as[String].collect()(0) ==
      "a long enough genuine content sentence here.")
  }
}
