package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → main-text extraction: the raw-web→text step in front of the
  * curation gates (Gopher/C4/PII assume extracted text; a crawl corpus
  * arrives as markup). The shape is the jusText / trafilatura family:
  * split the page into block-level segments, score each block with
  * layout-free signals (text length, link density), keep content blocks,
  * drop boilerplate (navigation, footers, headers, script/style).
  *
  * Everything is Column algebra — regexp/split/transform/filter — so the
  * extractor codegens inside the scan stage and composes with the
  * downstream gates in one job; at 100 TB this is a map-only pass with
  * zero shuffle, exactly like the quality filters it feeds.
  *
  * Rules (integer thresholds — no float comparisons, so decisions are
  * bit-deterministic and SQL-replicable):
  *   - `<script>`/`<style>`/comments are deleted outright;
  *   - the page splits into segments on block-level tags (p, div, h1-6,
  *     li, nav, footer, …); inline tags (`<a>`, `<b>`, …) stay inside
  *     their segment;
  *   - per segment: `text` = tags stripped, entities decoded, whitespace
  *     collapsed; `anchor_len` = characters of `text` contributed from
  *     inside `<a>` elements (computed as the length delta when anchor
  *     elements are deleted before stripping);
  *   - keep iff `length(text) >= minChars` AND
  *     `anchor_len * ldDen <= length(text) * ldNum` (link density ≤
  *     ldNum/ldDen — boilerplate nav/footer rows are nearly all link
  *     text, content paragraphs are not).
  */
object Html {

  /** Block-level tag split pattern (open or close, any attributes). */
  private val blockTagRe =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|nav|footer|header|section|" +
      "article|aside|main|table|thead|tbody|tr|td|th|blockquote|pre|" +
      "form|figure|figcaption|hr|br|body|html|head|title|meta|link)" +
      "(?:[\\s/][^>]*)?>"

  /** Decode the entity set a synthesizer/escaper emits (`&amp;` LAST so
    * escaped entity names survive one round-trip: `&amp;lt;` → `&lt;`).
    * Guarded on `&` presence — most blocks carry no entities, and the
    * six-replace chain is the hot per-segment cost otherwise. */
  def unescapeEntities(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    when(instr(c, "&") === 0, c).otherwise(
      steps.foldLeft(c) { case (acc, (from, to)) =>
        replace(acc, lit(from), lit(to))
      })
  }

  /** Minimal escape for synthesizing HTML from raw text (`&` FIRST). */
  def escapeText(c: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(c) { case (acc, (from, to)) =>
        replace(acc, lit(from), lit(to))
      }

  /** Strip every tag, decode entities, collapse whitespace. */
  private def segText(seg: Column): Column =
    trim(regexp_replace(
      unescapeEntities(regexp_replace(seg, "<[^>]*>", "")), "\\s+", " "))

  /** (text, anchor_len) per block-level segment of the page.
    *
    * Three materializing transform stages so the hot per-segment regex
    * chains run ONCE each (a single-stage form re-evaluates the whole
    * chain per struct field that references it — expression trees have
    * no lets): stage 1 strips tags, stage 2 decodes+normalizes, stage 3
    * computes the anchor delta ONLY for segments that contain an `<a`
    * (nav/footer/inline-link blocks — a handful per page). */
  def blocks(html: Column): Column = {
    val noJunk = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->",
      "")
    val stripped = transform(split(noJunk, blockTagRe), seg =>
      struct(seg.as("raw"),
        regexp_replace(seg, "<[^>]*>", "").as("st")))
    val texted = transform(stripped, s =>
      struct(s.getField("raw").as("raw"),
        trim(regexp_replace(unescapeEntities(s.getField("st")),
          "\\s+", " ")).as("text")))
    transform(texted, s => {
      val t = s.getField("text")
      val noAnchors = segText(regexp_replace(s.getField("raw"),
        "(?is)<a[\\s>][^>]*>.*?</a>|<a>.*?</a>", ""))
      struct(t.as("text"),
        when(instr(s.getField("raw"), "<a") === 0, lit(0))
          .otherwise((length(t) - length(noAnchors)).cast("int"))
          .as("anchor_len"))
    })
  }

  /** Kept content blocks (see rules above). */
  def keptBlocks(html: Column, minChars: Int = 20,
      ldNum: Int = 1, ldDen: Int = 3): Column =
    filter(blocks(html), b =>
      length(b.getField("text")) >= minChars &&
        b.getField("anchor_len") * ldDen <=
          length(b.getField("text")) * ldNum)

  /** The page's main text: kept blocks joined by newline. */
  def mainText(html: Column, minChars: Int = 20,
      ldNum: Int = 1, ldDen: Int = 3): Column =
    array_join(transform(keptBlocks(html, minChars, ldNum, ldDen),
      b => b.getField("text")), "\n")

  /** Number of kept blocks. */
  def keptCount(html: Column, minChars: Int = 20,
      ldNum: Int = 1, ldDen: Int = 3): Column =
    size(keptBlocks(html, minChars, ldNum, ldDen)).cast("bigint")

  /** All anchor href values, in document order — the page's outgoing
    * link list, the raw material of the crawl link graph
    * ([[graft.operators.Graphs.pageRank]] consumes these after
    * [[Urls.resolve]]/[[Urls.normalize]]). Double-quoted href
    * attributes only (the overwhelmingly dominant form; a crawl
    * normalizer rewrites the rest). The attribute name must follow a
    * whitespace delimiter — without it, an earlier attribute that merely
    * ENDS in "href" (`<a data-href="x" href="y">`) would donate its
    * value first and the real edge would be lost. */
  def hrefs(html: Column): Column =
    regexp_extract_all(html,
      lit("(?i)<a\\s(?:[^>]*?\\s)?href=\"([^\"]*)\""), lit(1))

  /** All (href, text) anchor pairs — the inbound-anchor-text signal:
    * what OTHER pages call a target describes it better than the target
    * describes itself (the classic retrieval/curation prior). Two
    * extractions of the SAME pattern zip positionally (identical match
    * sets, so the arrays always align); anchor text has inner markup
    * stripped and whitespace collapsed. Unlike [[hrefs]] this requires
    * the closing `</a>` — an unclosed anchor has no text to take. */
  def anchors(html: Column): Column = {
    val re = "(?is)<a\\s(?:[^>]*?\\s)?href=\"([^\"]*)\"[^>]*>(.*?)</a>"
    zip_with(
      regexp_extract_all(html, lit(re), lit(1)),
      regexp_extract_all(html, lit(re), lit(2)),
      (h, t) => struct(h.as("href"),
        trim(regexp_replace(regexp_replace(t, "<[^>]*>", " "),
          "\\s+", " ")).as("text")))
  }

  // ---------------------------------------------------------------------
  // Deterministic gate fixture: a full page synthesized from a documents
  // row — boilerplate head/nav/footer + the doc text as <p> paragraphs of
  // `chunkTokens` tokens + one constant entity/anchor paragraph — so the
  // EXPECTED extraction is a closed form of the raw text that DuckDB
  // reconstructs with list ops (the image_neardup oracle pattern), while
  // the Spark side runs the FULL markup path: escape → tags → split →
  // density → decode.
  // ---------------------------------------------------------------------

  /** The constant content paragraph: exercises entity decode AND an
    * inline anchor whose text must be PRESERVED (link density below the
    * keep threshold), independent of the doc's own text. */
  val constParaHtml: String =
    "<p>Q&amp;A &lt;guide&gt; with <a href=\"/deep\">ampersands</a> " +
      "&amp; angle brackets</p>"
  val constParaText: String =
    "Q&A <guide> with ampersands & angle brackets"

  /** Synthesize the fixture page for one (doc_id, text) row.
    * `related` injects extra markup (e.g. a "related articles" aside of
    * cross-document anchors for the link-graph queries) between the
    * content div and the footer; the default empty string leaves the
    * page byte-identical to the pre-`related` form, so every pinned
    * extraction oracle is unaffected. */
  def synthPage(docId: Column, text: Column,
      chunkTokens: Int = 12, related: Column = lit("")): Column = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    // Column `/` is double division — floor back to an exact int count
    val nChunks = greatest(
      floor((n + lit(chunkTokens - 1)) / lit(chunkTokens)).cast("int"),
      lit(1))
    val paras = array_join(
      transform(sequence(lit(0), nChunks - 1), i =>
        concat(lit("<p>"),
          escapeText(array_join(
            slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " ")),
          lit("</p>"))),
      "\n")
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"),
      lit("</title><style>body { margin: 0; }</style>" +
        "<script>var t = 1 < 2;</script></head>\n<body>\n" +
        "<nav><a href=\"/\">Home</a> <a href=\"/docs\">Docs</a> " +
        "<a href=\"/about\">About</a></nav>\n" +
        "<!-- rendered by graft-fixture -->\n<div class=\"content\">\n"),
      paras,
      lit("\n" + constParaHtml + "\n</div>\n"),
      related,
      lit("<footer><a href=\"/tos\">Terms of Service</a> · " +
        "<a href=\"/privacy\">Privacy Policy</a> · " +
        "<a href=\"/contact\">Contact</a></footer>\n</body></html>"))
  }
}
