package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus processing: tokenization,
  * quality stats, language-ID heuristic, shingling, fingerprints. All pure
  * Column algebra (codegen'd, partition-parallel, no driver round-trips) —
  * every helper here runs unchanged over a 100 TB `documents` table.
  *
  * The reference has no text operators (SURVEY §2.6); these are the
  * training-data-pipeline extensions (SURVEY §7 M5).
  */
object TextFunctions {

  /** Whitespace tokenization. Empty/blank text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word k-shingles: overlapping windows of k tokens joined by one space.
    * Fewer than k tokens → the whole text as a single shingle. */
  def wordShingles(text: Column, k: Int): Column = {
    val ts = tokens(text)
    when(size(ts) <= k, array(concat_ws(" ", ts)))
      .otherwise(transform(
        sequence(lit(0), size(ts) - k),
        i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
  }

  /** Character n-grams of the raw text (for n-gram Jaccard dedup). */
  def charNgrams(text: Column, n: Int): Column = {
    val len = length(text)
    when(len <= n, array(text))
      .otherwise(transform(
        sequence(lit(1), len - n + 1),
        i => text.substr(i, lit(n))))
  }

  // stopword markers per language (tiny fixed lists; a real system ships
  // frequency tables — the *operator shape* is what matters here: an
  // array_intersect count per language, one pass, no UDF)
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "de", "est", "que"))

  /** Count of tokens that appear in `words` (language marker score).
    * Counts token OCCURRENCES (not distinct hits) so longer texts score
    * proportionally. */
  def markerCount(text: Column, words: Seq[String]): Column = {
    val wordsArr = array(words.map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(wordsArr, t)))
  }

  /** Language-ID heuristic: argmax of marker-word counts with a fixed
    * tie-break order (en > es > de > fr > und). Deterministic and
    * SQL-expressible, so oracle-checkable. */
  def langIdHeuristic(text: Column): Column = {
    val en = markerCount(text, stopwords("en"))
    val es = markerCount(text, stopwords("es"))
    val de = markerCount(text, stopwords("de"))
    val fr = markerCount(text, stopwords("fr"))
    when(en + es + de + fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Quality stats: exact integer counts plus IEEE-deterministic ratios
    * (double division of exact ints is bit-reproducible across engines). */
  def qualityStats(text: Column): Seq[Column] = {
    val nChars = length(text).cast("bigint")
    val toks = tokens(text)
    val nTokens = size(toks).cast("bigint")
    val nStop = size(filter(tokens(lower(text)),
      t => array_contains(array(stopwords("en").map(lit): _*), t))).cast("bigint")
    val nAlpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("bigint")
    Seq(
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      nStop.as("n_stopwords"),
      nAlpha.as("n_alpha"),
      when(nTokens === 0, lit(0.0))
        .otherwise(nStop.cast("double") / nTokens.cast("double"))
        .as("stopword_ratio"),
      when(nTokens === 0, lit(0.0))
        .otherwise(nChars.cast("double") / nTokens.cast("double"))
        .as("chars_per_token"))
  }

  /** MD5-based document fingerprint (cross-engine reproducible: md5 is md5).
    * Normalizes whitespace first so formatting-only variants collide. */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))
}
