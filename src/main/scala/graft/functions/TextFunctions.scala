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

  /** Whitespace tokenization. NULL or blank text → empty array (a null
    * here would poison every downstream score into null and, e.g., make
    * langId fall through to its last branch). */
  def tokens(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word k-shingles from a PRECOMPUTED token array column (attribute).
    * Fewer than k tokens → the whole token list as a single shingle.
    *
    * The token argument must be cheap to re-evaluate (an attribute): the
    * lambda body references it per element, so passing the raw `split`
    * expression here would re-tokenize the text per shingle — O(tokens²). */
  def wordShinglesFromTokens(toks: Column, k: Int): Column =
    when(size(toks) <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** Convenience single-expression form. Only safe where the input is
    * already an attribute or tiny; hot paths should bind tokens in their
    * own projection first (see wordShinglesFromTokens). */
  def wordShingles(text: Column, k: Int): Column =
    wordShinglesFromTokens(tokens(text), k)

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
    * SQL-expressible, so oracle-checkable.
    *
    * Single-column convenience form; tokenizes per marker list. Prefer
    * `langIdStaged` on hot paths — Spark's common-subexpression elimination
    * does not reach inside when/otherwise branches, so this form re-splits
    * the text ~8×. */
  def langIdHeuristic(text: Column): Column =
    langIdFromTokens(tokens(lower(text)))

  /** Language-ID from a precomputed (lowercased) token array. */
  def langIdFromTokens(toks: Column): Column = {
    def score(words: Seq[String]): Column = {
      val wordsArr = array(words.map(lit): _*)
      size(filter(toks, t => array_contains(wordsArr, t)))
    }
    val en = score(stopwords("en"))
    val es = score(stopwords("es"))
    val de = score(stopwords("de"))
    val fr = score(stopwords("fr"))
    when(en + es + de + fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Two-stage language-ID over a DataFrame: tokenize once in a separate
    * projection (CollapseProject keeps expensive exprs used many times in
    * their own stage), then score. ~8× less split() work than the
    * single-expression form. */
  def langIdStaged(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("__toks", tokens(lower(col(textCol))))
      .withColumn(outCol, langIdFromTokens(col("__toks")))
      .drop("__toks")

  /** Quality stats: exact integer counts plus IEEE-deterministic ratios
    * (double division of exact ints is bit-reproducible across engines). */
  def qualityStats(text: Column): Seq[Column] = {
    val nChars = coalesce(length(text), lit(0)).cast("bigint")
    val toks = tokens(text)
    val nTokens = size(toks).cast("bigint")
    val nStop = size(filter(tokens(lower(text)),
      t => array_contains(array(stopwords("en").map(lit): _*), t))).cast("bigint")
    val nAlpha = coalesce(
      length(regexp_replace(text, "[^a-zA-Z]", "")), lit(0)).cast("bigint")
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

  /** The Gopher document-quality rules (Rae et al. 2021, §A1.1) as
    * EXACT integer signals plus the composite keep flag. Every
    * threshold is a cross-multiplied integer comparison (3 ≤ mean word
    * length ≤ 10 becomes 3·n_tok ≤ n_nonspace ≤ 10·n_tok), so the whole
    * surface is bit-reproducible across engines — no FP ratio ever
    * crosses a threshold differently on a different platform. Map-only
    * Column algebra: runs unchanged over a 100 TB corpus.
    *
    * Rules: (1) 50 ≤ words ≤ 100 000; (2) mean word length in [3, 10];
    * (3) symbol-to-word ratio ('#' or '…') ≤ 0.1; (4) ≤ 90% of lines
    * start with a bullet; (5) ≤ 30% of lines end with an ellipsis;
    * (6) ≥ 80% of words contain a letter; (7) ≥ 2 distinct Gopher stop
    * words (the, be, to, of, and, that, have, with). */
  def gopherSignals(text: Column): Seq[Column] = {
    val t = coalesce(text, lit(""))
    val toks = tokens(t)
    val nTok = size(toks).cast("bigint")
    val nonspace = length(regexp_replace(t, "\\s", "")).cast("bigint")
    val alphaTok = size(filter(toks, tk => tk.rlike("[A-Za-z]")))
      .cast("bigint")
    val gopherStops =
      Seq("the", "be", "to", "of", "and", "that", "have", "with")
    // one tokenization per doc: lowercase the token array, never
    // re-split (lowercasing cannot introduce or remove whitespace)
    val stopKinds = size(array_intersect(
      array_distinct(transform(toks, tk => lower(tk))),
      array(gopherStops.map(lit): _*))).cast("bigint")
    // symbols: '#', the one-char ellipsis, AND ASCII '...' (counted
    // non-overlapping left-to-right — the same form rule 5's line-end
    // regex treats as an ellipsis)
    val nSym = ((length(t) - length(regexp_replace(t, "[#…]", ""))) +
      (size(split(t, "\\.\\.\\.")) - 1)).cast("bigint")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("bigint")
    val nBullet = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
      .cast("bigint")
    val nEllipsis = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
      .cast("bigint")
    val keep = (nTok >= 50) && (nTok <= 100000) &&
      (nonspace >= nTok * 3) && (nonspace <= nTok * 10) &&
      (nSym * 10 <= nTok) &&
      (nBullet * 10 <= nLines * 9) &&
      (nEllipsis * 10 <= nLines * 3) &&
      (alphaTok * 5 >= nTok * 4) &&
      (stopKinds >= 2)
    Seq(nTok.as("n_tokens"), nonspace.as("n_nonspace"),
      alphaTok.as("n_alpha_tokens"), stopKinds.as("n_stop_kinds"),
      nSym.as("n_symbol_chars"), nLines.as("n_lines"),
      nBullet.as("n_bullet_lines"), nEllipsis.as("n_ellipsis_lines"),
      keep.as("keep"))
  }

  /** Just the [[gopherSignals]] composite keep flag — the form a
    * filter chain wants. */
  def gopherKeep(text: Column): Column = gopherSignals(text).last

  /** The Gopher repetition signals (Rae et al. 2021, §A1.2, the
    * duplicate-line / top-n-gram family) as exact integer counts plus
    * the composite keep flag — the companion filter to
    * [[gopherSignals]]: boilerplate, scraper loops and keyword spam
    * show up as repeated lines and a dominant word bigram.
    *
    *   - duplicate-line fraction ≤ 0.30 (10·dup ≤ 3·lines)
    *   - duplicate-line CHARACTER fraction ≤ 0.20 (5·dupChars ≤ chars);
    *     "duplicate" counts every occurrence of a line whose per-doc
    *     count is ≥ 2
    *   - top word-2-gram character mass ≤ 0.20 of non-space chars
    *     (mass = occurrences × combined word length, separator excluded)
    *
    * All thresholds are cross-multiplied integer comparisons — the keep
    * flag is bit-reproducible cross-engine. Scale shape: two
    * hash-partitioned (doc, key) aggregates (lines, bigrams) + a join
    * back on doc_id — the corpusFreqStats shape, never a per-token
    * window; gram rows are linear in tokens. */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
      coalesce(col(textCol), lit("")).as("__t"))
      .select(col("doc_id"),
        length(regexp_replace(col("__t"), "\\s", "")).cast("bigint")
          .as("n_nonspace"),
        split(col("__t"), "\n").as("__lines"),
        tokens(col("__t")).as("__toks"))
    val lstats = base
      .select(col("doc_id"), explode(col("__lines")).as("line"))
      .groupBy("doc_id", "line").agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("line")).cast("bigint"))
      .groupBy("doc_id").agg(
        sum("cnt").as("n_lines"),
        coalesce(sum(when(col("cnt") >= 2, col("cnt"))), lit(0L))
          .as("n_dup_lines"),
        sum(col("cnt") * col("len")).as("line_chars"),
        coalesce(sum(when(col("cnt") >= 2, col("cnt") * col("len"))),
          lit(0L)).as("dup_line_chars"))
    val grams = base.select(col("doc_id"),
      explode(when(size(col("__toks")) >= 2,
        transform(sequence(lit(0), size(col("__toks")) - 2),
          i => struct(
            (length(element_at(col("__toks"), i + 1)) +
              length(element_at(col("__toks"), i + 2))).cast("bigint")
              .as("glen"),
            concat_ws(" ", element_at(col("__toks"), i + 1),
              element_at(col("__toks"), i + 2)).as("gram"))))
        .otherwise(array().cast("array<struct<glen:bigint,gram:string>>")))
        .as("g"))
      .select(col("doc_id"), col("g.gram").as("gram"), col("g.glen").as("glen"))
    // "top" = the MOST FREQUENT bigram (Gopher §A1.2), its mass =
    // occurrences × combined word chars; ties on count break to the
    // larger mass (struct ordering is lexicographic in both engines,
    // and equal (cnt, glen) grams have equal mass — deterministic)
    val bstats = grams.groupBy("doc_id", "gram")
      .agg(count(lit(1)).as("cnt"), max("glen").as("glen"))
      .groupBy("doc_id").agg(
        max(struct(col("cnt"), col("glen"))).as("topg"),
        sum(col("cnt")).as("n_bigrams"))
      .select(col("doc_id"),
        (col("topg.cnt") * col("topg.glen")).as("top_bigram_mass"),
        col("n_bigrams"))
    base.select(col("doc_id"), col("n_nonspace"))
      .join(lstats, Seq("doc_id"), "left")
      .join(bstats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_nonspace"),
        col("n_lines"), col("n_dup_lines"),
        col("line_chars"), col("dup_line_chars"),
        coalesce(col("top_bigram_mass"), lit(0L)).as("top_bigram_mass"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
      .withColumn("keep",
        (col("n_dup_lines") * 10 <= col("n_lines") * 3) &&
          (col("dup_line_chars") * 5 <= col("line_chars")) &&
          (col("top_bigram_mass") * 5 <= col("n_nonspace")))
  }

  /** MD5-based document fingerprint (cross-engine reproducible: md5 is md5).
    * Normalizes whitespace first so formatting-only variants collide. */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** BPE-ish pre-tokenization: letter runs, single digits, single
    * punctuation marks — the GPT-2-style split shape, restricted to a
    * regex both engines' dialects (Java regex / RE2) treat identically
    * (no lookaround, no unicode classes). Counting THESE approximates
    * LLM token counts far better than whitespace words (punctuation and
    * digits tokenize separately). */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column =
    size(bpeTokens(text)).cast("bigint")

  /** Remove REPEATED paragraphs/lines within a document, keeping first
    * occurrences in order (the Gopher/RefinedWeb-style intra-doc
    * repetition filter: boilerplate and scraper loops show up as exact
    * repeated segments). array_position(seg)==idx keeps exactly the
    * first occurrence of each segment; one map-only pass at any scale.
    *
    * `segsCol` must be a PRECOMPUTED attribute (the lambda reads it per
    * element — an inline split() would re-split per segment, O(segs²)).
    * Use [[dedupSegmentsStaged]] unless you already have the array. */
  def dedupSegmentsFromArray(segsCol: Column, sep: String): Column =
    concat_ws(sep,
      filter(segsCol, (s, i) => array_position(segsCol, s) === i + 1))

  /** Two-stage intra-doc repetition removal over a DataFrame: split once
    * in its own projection, then filter first occurrences. */
  /** C4-style boilerplate line filter (Raffel et al. 2020 §2.2, the
    * public "Colossal Clean Crawled Corpus" heuristics): a line survives
    * when it ends in terminal punctuation, carries at least `minWords`
    * whitespace-delimited words, contains no `{` (code/markup tell) and
    * not the phrase "lorem ipsum". Pure higher-order Column algebra —
    * codegen'd, no UDF — and every predicate is replicable in ANSI SQL,
    * so the operator is hash-oracle-checkable cross-engine. */
  def c4KeepLine(line: Column, minWords: Int = 5): Column = {
    val t = trim(line)
    t.rlike("[.!?\"]$") &&
      size(split(t, " ")) >= minWords &&
      !t.contains("{") &&
      !lower(t).contains("lorem ipsum")
  }

  /** The surviving lines of a document, in order. */
  def c4CleanLines(text: Column, minWords: Int = 5): Column =
    filter(split(text, "\n"), l => c4KeepLine(l, minWords))

  def dedupSegmentsStaged(df: org.apache.spark.sql.DataFrame,
      textCol: String, outCol: String, sep: String): org.apache.spark.sql.DataFrame =
    df.withColumn("__segs",
        split(col(textCol), java.util.regex.Pattern.quote(sep)))
      .withColumn(outCol, dedupSegmentsFromArray(col("__segs"), sep))
      .drop("__segs")

  /** Per-document corpus-frequency statistics — the exact-arithmetic core
    * of a unigram-LM quality filter: for each document, `n_tokens` and
    * `freq_mass` = Σ over its tokens of that token's corpus-wide count.
    * A low mean frequency (freq_mass / n_tokens / corpus_total) marks
    * gibberish/rare-token documents; the downstream float math is the
    * caller's, the engine emits exact BIGINTs (cross-engine verifiable —
    * a log-prob sum would hash differently per summation order).
    *
    * Shape at 100 TB: tokenize once, partial-aggregate the token counts
    * map-side (the count table is |vocab|, not |corpus|), shuffle-join
    * tokens to counts on the token key, re-aggregate per document. Not a
    * `count over (partition by token)` window — that would funnel every
    * occurrence of a stopword through a single task. */
  def corpusFreqStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
    val counts = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    toks.join(counts, "__tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__tf")).as("freq_mass"))
  }

  // --- PII scrubbing ------------------------------------------------------
  // Regexes restricted to the shared Java-regex/RE2 dialect (character
  // classes, bounded repetition, non-capturing groups — no lookaround), so
  // the redaction is reproducible in the DuckDB oracle and in any RE2-based
  // downstream scrubber. Order matters: emails first (their local part can
  // contain digit runs a later pass would half-eat), then IPs (dotted quads
  // would otherwise match the phone pattern), then phones.

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9](?:[-() ]{0,2}[0-9]){6,}"

  /** Redact emails, IPv4 addresses, and phone-like digit runs with typed
    * placeholder tags. Pure codegen'd Column algebra — a 100 TB scrub is
    * one map-only pass, no shuffle. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }
}
