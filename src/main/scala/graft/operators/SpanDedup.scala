package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document exact duplicate-SPAN removal — the token-level
  * counterpart of document-level dedup (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better": repeated substrings are
  * memorized disproportionately, and removing the SPAN beats dropping
  * either whole document). Document-level ops (`Dedup`, `Clustering`)
  * decide which docs survive; this one edits the survivors.
  *
  * Contract: a token k-gram occurring in MORE THAN ONE document is a
  * duplicate span; the lowest-id document containing it is the keeper,
  * every other document drops all tokens covered by any of its duplicate
  * spans. Output keeps every input row: (id, n_tokens, n_dup_tokens,
  * text_clean).
  *
  * Scale shape (the point of the design):
  *   - one gram row per corpus token (not k per token) — the shuffle is
  *     keyed by gram hash, volume linear in corpus size;
  *   - keeper/multiplicity is a partial-aggregated groupBy (map-side
  *     combine absorbs hot grams — a boilerplate span repeated in a
  *     million docs arrives at the reducer pre-combined per partition);
  *   - covered positions are per (doc, pos), bounded by corpus token
  *     count no matter how pathological the duplication;
  *   - the rebuild is a position-sorted per-doc fold, state bounded by
  *     document length. No driver collect anywhere.
  */
object SpanDedup {

  /** @param k span length in tokens (8 mirrors the decontamination
    *          k-gram and the MinHash shingle width used elsewhere) */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, "span length must be >= 2")
    // null text → "" (a null would otherwise flow through split and
    // surface as null n_tokens/text_clean rows)
    val toks = df.select(col(idCol).as("__id"),
      split(coalesce(col(textCol), lit("")), " ").as("__w"))
    val nw: Column = size(col("__w"))

    // (id, p, gram): one md5'd k-gram per start position 1..nw-k+1.
    // sequence() is guarded — Spark generates DESCENDING sequences when
    // start > stop, so an unguarded nw < k would fabricate positions
    val starts = when(nw >= k, sequence(lit(1), nw - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val grams = toks.select(col("__id"),
      explode(transform(starts, i => struct(i.as("p"),
        md5(array_join(slice(col("__w"), i, lit(k)), " ")).as("gram")))).as("g"))
      .select(col("__id"), col("g.p").as("p"), col("g.gram").as("gram"))

    val dup = grams.groupBy("gram")
      .agg(min("__id").as("keeper"), countDistinct("__id").as("nd"))
      .filter(col("nd") > 1)
      .select("gram", "keeper")

    // per-doc covered positions as ONE sorted array row: the shuffle
    // volume from here on is bounded by DUPLICATE tokens, not corpus
    // tokens (an earlier per-(doc,pos) anti-join + regroup + rejoin
    // shuffled the full token stream three times; this shape shuffles
    // it once, into the final join)
    val covered = grams.join(dup, "gram")
      .filter(col("__id") =!= col("keeper"))
      .select(col("__id"), explode(sequence(col("p"), col("p") + (k - 1)))
        .as("pos"))
      .distinct()
      .groupBy("__id")
      .agg(array_sort(collect_list(col("pos"))).as("__cov"))

    // rebuild map-side as GAP SLICES: the sorted covered array cuts the
    // token array into |covered|+1 kept segments — zip the covered
    // positions against themselves shifted by one ((0,c1),(c1,c2),…,
    // (ck,nw+1)) and slice each open interval out of __w. Each slice
    // costs its own length, so the rebuild is O(tokens + covered) per
    // doc (an earlier per-token array_contains probe re-scanned the
    // covered array per token — O(tokens × covered), quadratic on a
    // fully-covered doc). Zero work for the (typical) docs with no
    // duplicate span (__cov null).
    val lo = concat(array(lit(0)), col("__cov"))
    val hi = concat(col("__cov"), array(nw + 1))
    toks.join(covered, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        nw.cast("bigint").as("n_tokens"),
        coalesce(size(col("__cov")), lit(0)).cast("bigint")
          .as("n_dup_tokens"),
        when(col("__cov").isNull, array_join(col("__w"), " "))
          .otherwise(array_join(
            flatten(zip_with(lo, hi, (a, b) =>
              slice(col("__w"), a + 1, b - a - 1))), " "))
          .as("text_clean"))
  }

  /** Cross-document exact PARAGRAPH dedup (the RefinedWeb/MassiveText
    * granularity between whole-document `Dedup.exact` and token-span
    * [[removeDupSpans]]): a paragraph occurring anywhere else in the
    * corpus survives only at its globally-first occurrence — (min id,
    * min position) — and every other occurrence is removed; documents
    * are rebuilt from their surviving paragraphs in order. Catches the
    * boilerplate that repeats ACROSS pages of a site (cookie banners,
    * footers, bio blurbs) which document-level dedup never sees and
    * span dedup only catches past k tokens.
    *
    * Scale shape — JOIN-FREE by construction (the kept set IS the
    * winner rows, which carry their paragraph text through the
    * aggregate, so nothing ever joins back on the hash key): (1) winner
    * selection, a partial-aggregated min keyed by the 64-bit paragraph
    * hash — map-side combine absorbs the million-occurrence banner
    * (each input partition emits ONE candidate row per hash class, so a
    * boilerplate paragraph on every doc shuffles ≤ #partitions rows,
    * not #occurrences, and is ONE row everywhere downstream); (2) the
    * per-doc rebuild of winner rows keyed by doc id, sort bounded by
    * document length; (3) per-doc paragraph counts as a MAP-ONLY
    * projection on the input (no second explode), id-keyed merge with
    * the rebuild. No exchange is keyed by anything a hot paragraph can
    * skew — the previous formulation joined every occurrence back to
    * its winner on the hash key, and a 33%-boilerplate corpus ran the
    * composed web-curation chain 5.7× slower through that one funnel
    * (AQE's skew split only engages past its 256 MB partition
    * threshold; this shape needs no split at any size). Asserted under
    * a planted 33%-boilerplate corpus in SpanDedupSkewSpec. Occurrence identity runs
    * on xxhash64 classes: two DISTINCT paragraphs colliding (~2⁻⁶⁴)
    * would wrongly merge — the [[Dedup.jaccardPrefixPairs]] caveat;
    * group on the string itself if absolute exactness is required.
    *
    * Output keeps every input row: (id, n_paras, n_kept, text_clean).
    * `sepRegex` splits paragraphs (default newline); blank paragraphs
    * are dropped, the rebuild joins with a single newline. */
  def removeDupParagraphs(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n"): DataFrame = {
    val paras = df
      .select(col(idCol).as("__id"),
        posexplode_outer(split(coalesce(col(textCol), lit("")), sepRegex))
          .as(Seq("__idx", "__p")))
      .filter(length(trim(col("__p"))) > 0)
      .select(col("__id"), col("__idx"), col("__p"),
        xxhash64(col("__p")).as("__h"))
    // the winner CARRIES its text: __p is identical across a hash class
    // (collision caveat above), so min(struct(id, idx, p)) == the join's
    // winner row, and the kept set needs no join back on __h
    val winners = paras.groupBy("__h")
      .agg(min(struct(col("__id"), col("__idx"), col("__p"))).as("__w"))
      .select(col("__w.__id").as("__wid"),
        col("__w.__idx").as("__widx"), col("__w.__p").as("__p"))
    val rebuilt = winners.groupBy("__wid")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__widx"), col("__p")))),
            s => s.getField("__p")),
          "\n").as("text_clean"))
    // n_paras map-only from the input (no second explode); summed per id
    // so duplicate-id inputs keep the old combined-count semantics.
    // Paragraph-less docs (empty/blank text) keep their row: 0/0/""
    df.select(col(idCol).as("__id"),
        size(filter(split(coalesce(col(textCol), lit("")), sepRegex),
          p => length(trim(p)) > 0)).cast("long").as("__np"))
      .groupBy("__id").agg(sum(col("__np")).as("n_paras"))
      .join(rebuilt, col("__id") === col("__wid"), "left")
      .select(col("__id").as(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
