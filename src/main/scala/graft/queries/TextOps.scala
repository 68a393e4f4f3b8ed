package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Text-analysis + dedup queries over the `documents` table.
  *
  * minhash_pairs has a REAL oracle: at 128 hashes / 32 bands the candidate
  * recall at jaccard ≥ 0.8 is 1 - (1-0.8^4)^32 ≈ 1 - 5e-8, and false
  * candidates are removed by exact verification — so the output equals the
  * brute-force all-pairs exact-Jaccard result, which DuckDB computes
  * directly (500 docs at sf0.01 → 125k pairs, trivial).
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  /** Fanned read for the single-pass CPU-dense slots (regex/shingle
    * chains dominate their cost — [[Tables.fannedTable]]'s contract).
    * NOT used by the iterated/composite slots or the heavy drift
    * canaries, whose code must stay byte-stable. */
  private def fdocs(s: SparkSession, dir: String) =
    Tables.fannedTable(s, dir, "documents")

  val queries: Map[String, Q] = Map(
    "text_stats" -> ((s, dir) =>
      fdocs(s, dir).select(
        col("doc_id") +: TextFunctions.qualityStats(col("text")): _*)
        .orderBy("doc_id")),

    "lang_id" -> ((s, dir) =>
      TextFunctions.langIdStaged(
        fdocs(s, dir).select(col("doc_id"), col("lang").as("lang_label"),
          col("text")),
        "text", "lang_pred")
        .select("doc_id", "lang_label", "lang_pred")
        .orderBy("doc_id")),

    "fingerprint" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextFunctions.fingerprintMd5(col("text")).as("fp"))
        .orderBy("doc_id")),

    // LLM-style token counting: whitespace words vs BPE-ish pre-tokens
    // (letter runs / single digits / single punctuation) + their ratio
    // (exact-int division → bit-deterministic)
    "token_counts" -> ((s, dir) =>
      fdocs(s, dir).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("bigint").as("n_words"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe"),
        when(TextFunctions.tokenCount(col("text")) === 0, lit(0.0))
          .otherwise(TextFunctions.bpeTokenCount(col("text")).cast("double") /
            TextFunctions.tokenCount(col("text")).cast("double"))
          .as("bpe_per_word"))
        .orderBy("doc_id")),

    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text")
        .orderBy("text_hash")),

    "dedup_exact_kept" -> ((s, dir) =>
      Dedup.exactKept(docs(s, dir), "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    "dedup_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(docs(s, dir), "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 32, jaccardThreshold = 0.8)
        .orderBy("id_a", "id_b")),

    "dedup_minhash_kept" -> ((s, dir) =>
      Dedup.minhashKept(docs(s, dir), "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 32, jaccardThreshold = 0.8)
        .select("doc_id").orderBy("doc_id")),

    // End-to-end curation pipeline — the composition a training-data run
    // actually executes: quality gate (token count + stopword ratio) →
    // exact dedup among survivors → per-language doc/token budget.
    // Everything stays Column algebra, so the whole chain is one job
    // with pushdown intact, and it is oracle-checkable as plain SQL.
    "curate_pipeline" -> ((s, dir) => {
      val d = docs(s, dir)
      val toks = TextFunctions.tokens(col("text"))
      val nTokens = size(toks).cast("bigint")
      val nStop = size(filter(TextFunctions.tokens(lower(col("text"))),
        t => array_contains(
          array(TextFunctions.stopwords("en").map(lit): _*), t))).cast("bigint")
      val ratio = when(nTokens === 0, lit(0.0))
        .otherwise(nStop.cast("double") / nTokens.cast("double"))
      val gated = d.filter(nTokens >= 5 && ratio <= 0.6)
      val kept = Dedup.exactKept(gated, "doc_id", "text")
      kept.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.bpeTokenCount(col("text"))).as("total_bpe"))
        .orderBy("lang")
    }),

    // cross-document PARAGRAPH dedup (r11, RefinedWeb granularity):
    // each doc becomes 12-token paragraphs plus a corpus-wide planted
    // boilerplate line (every doc) and a second one on every third doc
    // — only the globally-first occurrence of any paragraph survives
    // (the site-footer/cookie-banner shape document-level dedup never
    // sees). The planted lines plus the fixture's genuine near-dup docs
    // (identical chunks across docs) make the removal data-driven; the
    // oracle replicates the chunking and the (doc, position) window in
    // SQL.
    "dedup_paragraphs" -> ((s, dir) => {
      val toks = split(trim(col("text")), "\\s+")
      val nChunks = greatest(
        floor((size(toks) + lit(11)) / lit(12)).cast("int"), lit(1))
      val chunks = transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * 12 + 1, lit(12)), " "))
      val planted = when(col("doc_id") % 3 === 0,
        array(lit("subscribe to our newsletter for daily updates"),
          lit("all rights reserved by the example media group")))
        .otherwise(
          array(lit("subscribe to our newsletter for daily updates")))
      val dirty = array_join(concat(chunks, planted), "\n")
      graft.operators.SpanDedup.removeDupParagraphs(
        docs(s, dir).select(col("doc_id"), dirty.as("text")),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // h=3 → 4×16-bit chunks: pigeonhole makes candidate recall TOTAL
    // within hamming ≤ 3, and the md5-derived token hash is replicable in
    // SQL — so brute-force per-bit hamming over all pairs is a REAL
    // oracle (500 docs at sf0.01).
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")),

    "dedup_ngram_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        n = 5, anchors = 4, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // EXACT all-pairs shingle-set Jaccard via prefix filtering (AllPairs /
    // PPJoin) — the scale path for exact near-dup pairs (minhash's set
    // definition WITHOUT minhash's probabilistic recall). The algorithm
    // is exact, so the brute-force pairwise SQL is a REAL oracle: any
    // prefix, length, or positional filter bug shows as a missing/extra
    // pair.
    "dedup_jaccard_exact" -> ((s, dir) =>
      Dedup.jaccardPrefixPairs(fdocs(s, dir), "doc_id", "text",
        tNum = 1, tDen = 2, shingleK = 3)
        .orderBy("id_a", "id_b")),

    // Transitive clusters over the minhash pair graph (large-star/small-
    // star connected components). The oracle recomputes the same pair set
    // brute-force (recall is total at j >= 0.8 — see dedup_minhash_pairs)
    // and takes its transitive closure with a recursive CTE; both engines
    // label each component by its min doc_id, so the outputs are equal
    // row-for-row.
    "dedup_cluster" -> ((s, dir) =>
      Dedup.clusterAssign(docs(s, dir), "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 32, jaccardThreshold = 0.8)
        .orderBy("doc_id")),

    "dedup_cluster_kept" -> ((s, dir) =>
      Dedup.clusterKept(docs(s, dir), "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 32, jaccardThreshold = 0.8)
        .orderBy("doc_id")),

    // keep-BEST representative per near-dup cluster (r11): the curation
    // keep rule — highest n_chars wins its cluster (ties to smaller id)
    // instead of the min id. Same pair graph + components as
    // dedup_cluster; only the selection differs, so the oracle is the
    // closure CTE + one ROW_NUMBER.
    // NOT fanned (r18, tried and reverted): a fanned read won 1.25× in
    // a light 9-slot subset window but LOST ~1.3 s in the full-session
    // after pass — its untouched canary sibling dedup_cluster ran
    // 3.14 s in the same pass while this slot sat at 4.43 s (they were
    // equal before). The CC star rounds over the pair graph inherit the
    // widened partitioning and pay per-round task overhead under full
    // session load — the r17 blanket-fanout lesson applies to this
    // iterated slot after all.
    "dedup_cluster_best" -> ((s, dir) =>
      Dedup.clusterKeepBest(docs(s, dir), "doc_id", "text", "n_chars",
        shingleK = 3, numHashes = 128, bands = 32, jaccardThreshold = 0.8)
        .select("doc_id").orderBy("doc_id")),

    // Heavy hitters via the mergeable Misra–Gries sketch. Capacity 256
    // exceeds the fixture vocabulary, so every count is exact (err = 0)
    // and a plain GROUP BY COUNT oracle hash-matches; the sketch shape
    // (O(capacity) state, map-side combine) is what survives a 100 TB
    // "top domains/tokens" without materializing the full count table.
    "freq_tokens" -> ((s, dir) => {
      import graft.functions.expressions.FreqItemsAggregate.freq_items
      docs(s, dir)
        .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .agg(freq_items(col("tok"), 256).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("token"), col("e.cnt").as("cnt"))
        .orderBy(desc("cnt"), col("token"))
    }),

    // Unigram-LM quality scoring, exact-integer form: per-doc token count
    // and corpus-frequency mass (see TextFunctions.corpusFreqStats).
    "rare_token_score" -> ((s, dir) =>
      TextFunctions.corpusFreqStats(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // distributed BPE tokenizer training: the learned merge table
    // (deterministic — count-desc, pair-lexicographic tie-break); the
    // iterative algorithm is not SQL-expressible, so this row is
    // ScalaTest-verified against a local reference implementation
    "bpe_train_merges" -> ((s, dir) =>
      graft.operators.BpeTrainer.merges(docs(s, dir), "text",
        numMerges = 12).orderBy("rank")),

    // cross-doc exact duplicate-span removal (token 8-grams seen in >1
    // doc; lowest-id doc keeps the span, the rest drop covered tokens) —
    // the planted near-dup pairs give the fixture 1000+ genuine
    // duplicated grams, so the removal is data-driven, not synthetic
    "dedup_spans" -> ((s, dir) =>
      graft.operators.SpanDedup.removeDupSpans(
        fdocs(s, dir), "doc_id", "text", k = 8)
        .orderBy("doc_id")),

    // BM25 keyword search (r7): inverted postings + broadcast query
    // terms + bounded-heap top-k. Scores are exact 1e-9-grid integers
    // (per-term contributions floored before the order-independent
    // BIGINT sum), so the output is layout-independent and pinnable
    "text_search_bm25" -> ((s, dir) =>
      graft.operators.TextSearch.bm25TopK(
        docs(s, dir), "doc_id", "text",
        graft.operators.TextSearch.queriesDf(s,
          Seq("spark window agg", "customer join filter")),
        "query_id", "query_text", k = 5)
        .orderBy("query_id", "rank")),

    // hybrid retrieval (r9): the BM25 arm and a hashed-tf-idf
    // dot-product arm fused with Reciprocal Rank Fusion — integer
    // arithmetic over integer-grid arm ranks end-to-end, so the fused
    // surface is layout-independent and pins like its two arms
    "hybrid_rrf_search" -> ((s, dir) =>
      graft.operators.TextSearch.hybridRrfTopK(
        docs(s, dir), "doc_id", "text",
        graft.operators.TextSearch.queriesDf(s,
          Seq("spark window agg", "customer join filter")),
        "query_id", "query_text", k = 5)
        .orderBy("query_id", "rank")),

    // doc-to-doc similarity WITHOUT an embedding model (r7): hashed
    // TF-IDF vectors (64 buckets, integer-grid idf — layout-independent
    // by construction) through the exact ANN baseline. sim dropped to
    // keep the pin integer-exact
    "tfidf_knn" -> ((s, dir) => {
      val vecs = graft.operators.TextSearch.hashedTfIdf(
        docs(s, dir), "doc_id", "text", dim = 64)
      val qs = vecs.filter(col("doc_id") < 5)
      graft.operators.Similarity.bruteForceTopK(vecs, qs,
        "doc_id", "tfidf", k = 5)
        .select(col("query_id"), col("rank"), col("corpus_id"))
        .orderBy("query_id", "rank")
    }),

    // the no-model text→ANN bridge END-TO-END (r8): the same hashed
    // TF-IDF vectors fed through the composed IVF-ADC approximate index
    // (coarse routing + residual PQ codes + exact rerank) instead of the
    // exact baseline — proving text reaches the APPROXIMATE stack, not
    // just bruteForceTopK. Deterministic end-to-end (layout-independent
    // vectors by the integer grid; IVF-ADC deterministic by
    // construction), so the oracle pins the observed sf0.01 rows
    "tfidf_ivfadc_knn" -> ((s, dir) => {
      val vecs = graft.operators.TextSearch.hashedTfIdfCached(
        docs(s, dir), "doc_id", "text", dim = 64,
        cacheKey = s"$dir/documents-tfidf64")
      val qs = vecs.filter(col("doc_id") < 5)
      graft.operators.ProductQuantizer.ivfAdcTopK(vecs, qs,
        "doc_id", "tfidf", k = 5, dim = 64, nlist = 8, nprobe = 6,
        m = 16, ksub = 16, iters = 3, rerank = 30,
        cacheKey = Some(s"$dir/documents-tfidf64"))
        .select(col("query_id"), col("rank"), col("corpus_id"))
        .orderBy("query_id", "rank")
    }),

    // the other half of the tokenizer pair: ENCODE with the corpus-trained
    // merge table (same 12 merges as bpe_train_merges, trained once per
    // dir via the merge cache). Every 10th doc keeps the output small
    // enough to pin; n_bpe + the first 12 symbols witness both the merge
    // application and the position-ordered rebuild
    "bpe_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val table = graft.operators.BpeTrainer.trainCached(
        d, "text", numMerges = 12, cacheKey = dir)
      graft.operators.BpeTrainer.encode(d, "doc_id", "text", table)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          size(col("bpe")).cast("bigint").as("n_bpe"),
          array_join(slice(col("bpe"), 1, 12), " ").as("head_syms"))
        .orderBy("doc_id")
    }),

    // Unigram-LM tokenizer (SentencePiece, Kudo 2018; r10): piece
    // probabilities learned by EM over the segmentation lattice, all
    // aggregated quantities on the 1e-9 integer grid → bit-identical
    // under any layout (pinnable). vocabSize=40 keeps the pin small;
    // single chars always survive for coverage.
    "unigram_train_vocab" -> ((s, dir) =>
      graft.operators.UnigramLm.vocabDf(docs(s, dir), "text",
        seedSize = 256, maxPieceLen = 4, emIters = 2, vocabSize = 40)
        .orderBy("rank")),

    // Viterbi encode with the trained model (same cached model as
    // unigram_train_vocab): exact integer DP per word TYPE, documents
    // rebuilt by position-sorted join. Every 20th doc keeps the pin small;
    // n_pieces + the first 10 pieces witness the DP and the rebuild.
    "unigram_encode" -> ((s, dir) => {
      val d = docs(s, dir)
      val v = graft.operators.UnigramLm.trainCached(d, "text",
        seedSize = 256, maxPieceLen = 4, emIters = 2, vocabSize = 40,
        cacheKey = dir)
      graft.operators.UnigramLm.encode(d, "doc_id", "text", v)
        .filter(col("doc_id") % 20 === 0)
        .select(col("doc_id"),
          size(col("pieces")).cast("bigint").as("n_pieces"),
          array_join(slice(col("pieces"), 1, 10), " ").as("head_pieces"))
        .orderBy("doc_id")
    }),

    // CCNet-style LM-perplexity filter (r9): hashed bigram LM trained
    // on the quality-gated target set, every doc scored by exact-grid
    // average NLL, worst-30 drop candidates. Order-sensitive (a
    // scrambled doc keeps its unigram profile but not its bigram
    // structure — NgramLmSpec asserts reversal scores worse); output
    // is exact integers, layout-independent, pinnable
    // fanned read (r18): both the target-LM count pass and the raw
    // scoring pass are regex-tokenize-dominated single-row-group scans
    // (profiled ~10 s of task CPU per pass at sf0.1 — single-task
    // before the fan); measured 1.2× same-window.
    "ccnet_perplexity" -> ((s, dir) => {
      val d = fdocs(s, dir)
      val target = d.filter(
        TextFunctions.qualityStats(col("text"))(4) >= 0.06)
      graft.operators.NgramLm.worst(d, target, "doc_id", "text",
        dim = 256, k = 30)
        .orderBy("rank")
    }),

    // model-based quality scoring (r9): a closed-form ridge linear
    // probe over the SAME cached hashed tf-idf vectors the knn bridge
    // uses, trained to replicate the heuristic quality gate (stopword
    // ratio ≥ 0.06, the text_stats/curate_pipeline signal) — the
    // linear-classifier-over-hashed-features shape of the GPT-3 /
    // fastText data filters, with the heuristic as the weak labeler.
    // Train is memoized per dir (the model is the ingest-time
    // artifact); the output is the score-decile histogram with
    // per-decile positive counts — integers, pinnable because training
    // is layout-independent by the 1e-9 Gram grid (QualityModelSpec
    // proves bit-identical weights under repartition)
    "quality_model_deciles" -> ((s, dir) => {
      val d = docs(s, dir)
      val vecs = graft.operators.TextSearch.hashedTfIdfCached(
        d, "doc_id", "text", dim = 64,
        cacheKey = s"$dir/documents-tfidf64")
      val ratio = TextFunctions.qualityStats(col("text"))(4)
      val labeled = vecs
        .select(col("doc_id"),
          graft.operators.QualityModel.unitize(col("tfidf")).as("tfidf"))
        .join(d.select(col("doc_id"),
          (ratio >= 0.06).cast("int").as("label")), Seq("doc_id"))
      val model = graft.operators.QualityModel.trainCached(
        labeled, "doc_id", "tfidf", "label", dim = 64, lambda = 1e-3,
        cacheKey = s"$dir/documents-tfidf64")
      labeled
        .select(col("label"),
          graft.operators.QualityModel.score(col("tfidf"), model).as("p"))
        .groupBy(least(floor(col("p") * 10), lit(9)).cast("int")
          .as("decile"))
        .agg(count(lit(1)).as("n"), sum("label").as("n_pos"))
        .orderBy("decile")
    })
  )

  // ---- oracle SQL ------------------------------------------------------

  private def markerSql(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> list_contains($list, t)))"
  }

  private val normTextSql =
    "array_to_string(string_split_regex(trim(text), '\\s+'), ' ')"

  // word k-shingles as a DuckDB list expression (k=3), distinct
  private val shinglesSql =
    """list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
      |  ELSE list_transform(range(1, len(toks) - 1),
      |         i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END)""".stripMargin

  val oracle: Map[String, String] = Map(
    // REAL closed-form oracle: rebuild the 12-token paragraphs + planted
    // boilerplate from the raw text, then the globally-first-occurrence
    // rule is one ROW_NUMBER window over (paragraph) ordered by
    // (doc_id, position)
    "dedup_paragraphs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, list_concat(
        |    list_transform(
        |      range(0, GREATEST(CAST(floor((len(toks) + 11) / 12.0) AS BIGINT), 1)),
        |      i -> array_to_string(toks[(i*12+1):(i*12+12)], ' ')),
        |    CASE WHEN doc_id % 3 = 0
        |      THEN ['subscribe to our newsletter for daily updates',
        |            'all rights reserved by the example media group']
        |      ELSE ['subscribe to our newsletter for daily updates'] END)
        |    AS paras
        |  FROM t
        |), p AS (
        |  SELECT doc_id, unnest(paras) AS para,
        |         unnest(range(1, len(paras) + 1)) AS idx
        |  FROM c
        |), f AS (
        |  SELECT doc_id, idx, para,
        |    ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, idx)
        |      AS rn
        |  FROM p WHERE length(trim(para)) > 0
        |), s AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_kept,
        |    string_agg(CASE WHEN rn = 1 THEN para END, chr(10)
        |      ORDER BY idx) AS text_clean
        |  FROM f GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  COALESCE(s.n_paras, 0) AS n_paras,
        |  COALESCE(s.n_kept, 0) AS n_kept,
        |  COALESCE(s.text_clean, '') AS text_clean
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Pinned sf0.01 worst-30 by bigram-LM average NLL (exact-grid
    // integers, layout-independent; NgramLmSpec proves == local
    // replica). Regenerate via SPARK_GRAFT_VERIFY_ONLY=ccnet_perplexity
    // on fixture/param change.
    "ccnet_perplexity" ->
      """SELECT * FROM (VALUES
        |  (CAST(106 AS BIGINT), CAST(1 AS INTEGER), CAST(12 AS BIGINT), CAST(5642785898 AS BIGINT)),
        |  (170, 2, 21, 5631982639), (194, 3, 28, 5625187219), (370, 4, 40, 5608681630),
        |  (110, 5, 10, 5594690537), (433, 6, 30, 5587917309), (464, 7, 34, 5571590362),
        |  (52, 8, 12, 5569813130), (201, 9, 55, 5569806627), (469, 10, 9, 5558571011),
        |  (148, 11, 36, 5558093341), (254, 12, 18, 5557187962), (350, 13, 84, 5556017547),
        |  (475, 14, 14, 5554298641), (407, 15, 19, 5553678393), (101, 16, 41, 5550902822),
        |  (358, 17, 10, 5548076521), (219, 18, 28, 5547888311), (438, 19, 30, 5545052252),
        |  (429, 20, 94, 5538205294), (177, 21, 48, 5536652742), (368, 22, 12, 5535843356),
        |  (36, 23, 21, 5532850489), (235, 24, 38, 5528794946), (248, 25, 78, 5523038625),
        |  (286, 26, 45, 5522797011), (495, 27, 69, 5520812253), (172, 28, 19, 5520424244),
        |  (145, 29, 71, 5518988171), (236, 30, 11, 5518632081)
        |) AS t(doc_id, rank, n_grams, nll9_avg)
        |ORDER BY rank""".stripMargin,
    // Pinned sf0.01 score-decile histogram of the ridge quality probe
    // (layout-independent by the 1e-9 Gram grid — QualityModelSpec
    // proves bit-identical weights under repartition; the monotone
    // n_pos/n gradient 0/54 → 68/68 is the separation evidence).
    // Regenerate via SPARK_GRAFT_VERIFY_ONLY=quality_model_deciles if
    // the fixture or probe params change.
    "quality_model_deciles" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS INTEGER), CAST(54 AS BIGINT), CAST(0 AS BIGINT)),
        |  (1, 42, 4), (2, 43, 4), (3, 53, 13), (4, 59, 31),
        |  (5, 47, 24), (6, 64, 47), (7, 34, 33), (8, 36, 35),
        |  (9, 68, 68)) AS t(decile, n, n_pos)
        |ORDER BY decile""".stripMargin,
    // Pinned-value oracle (the embed_ivf_topk pattern): BPE training is
    // deterministic by construction — pair counts are exact integer
    // aggregations (order-independent) and ties break lexicographically
    // — and verified bit-identical across 4- and 32-core layouts. The
    // exact merge table vs a local reference stays in ScalaTest.
    // Pinned oracles for the unigram-LM tokenizer (r10): training is
    // bit-identical under any layout (every aggregate on the 1e-9 grid —
    // UnigramLmSpec proves repartition(1) == repartition(16) and the
    // expression DPs == local replicas). Regenerate via
    // SPARK_GRAFT_VERIFY_ONLY=unigram_train_vocab,unigram_encode.
    "unigram_train_vocab" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS INTEGER), 'e', CAST(-2664212079 AS BIGINT)),
        |  (1, 's', -3126052032),
        |  (2, 'er', -3531720911),
        |  (3, 'join', -3606070128),
        |  (4, 'hash', -3624069239),
        |  (5, 'scan', -3636239134),
        |  (6, 'cust', -3639420190),
        |  (7, 'row', -3641253847),
        |  (8, 'omer', -3641330447),
        |  (9, 'slow', -3655988106),
        |  (10, 'line', -3665446084),
        |  (11, 'data', -3666828364),
        |  (12, 'agg', -3674863923),
        |  (13, 'key', -3679317043),
        |  (14, 'a', -3685798921),
        |  (15, 'part', -3700542353),
        |  (16, 'valu', -3701072000),
        |  (17, 'big', -3701987727),
        |  (18, 'filt', -3703209179),
        |  (19, 'sort', -3707779934),
        |  (20, 'fast', -3727753849),
        |  (21, 'park', -3738160859),
        |  (22, 'the', -3746022948),
        |  (23, 'or', -3747515794),
        |  (24, 'merg', -3748433493),
        |  (25, 'ow', -3841319005),
        |  (26, 'vect', -3843062856),
        |  (27, 'wind', -3856543159),
        |  (28, 'ream', -3904222920),
        |  (29, 'tabl', -3929266786),
        |  (30, 'st', -3931837502),
        |  (31, 'mall', -3949482348),
        |  (32, 'g', -4039492068),
        |  (33, 'roup', -4050162534),
        |  (34, 'h', -4157383625),
        |  (35, 'batc', -4159109193),
        |  (36, 'r', -4251940042),
        |  (37, 'y', -4255265096),
        |  (38, 'quer', -4275197538),
        |  (39, 'orde', -4425560025),
        |  (40, 'b', -4751917215),
        |  (41, 'l', -4992859348),
        |  (42, 't', -5002121994),
        |  (43, 'o', -5064213120),
        |  (44, 'p', -5147292336),
        |  (45, 'q', -5727832533),
        |  (46, 'm', -6320184080),
        |  (47, 'k', -7330484930),
        |  (48, 'v', -7944310261),
        |  (49, 'c', -9718799178),
        |  (50, 'w', -10154404531),
        |  (51, 'n', -10692929043),
        |  (52, 'd', -10962566478),
        |  (53, 'u', -11608320425),
        |  (54, 'f', -14512708824),
        |  (55, 'i', -14701626012),
        |  (56, 'j', -18935679418))
        |AS t("rank", piece, logp_grid)
        |ORDER BY "rank"""".stripMargin,
    "unigram_encode" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(44 AS BIGINT), 'key agg row scan slow fast tabl e valu e'),
        |  (20, 115, 'wind ow part slow cust omer join the scan big'),
        |  (40, 137, 'orde r scan line hash line wind ow c o'),
        |  (60, 142, 'key sort data scan big agg cust omer valu e'),
        |  (80, 49, 'part a vect or hash big join the orde r'),
        |  (100, 141, 'batc h data join scan tabl e slow filt er'),
        |  (120, 82, 's park c o l u m n vect or'),
        |  (140, 44, 'g roup agg big quer y filt er the sort'),
        |  (160, 68, 'batc h filt er the orde r orde r a'),
        |  (180, 52, 'agg quer y part merg e filt er cust omer'),
        |  (200, 96, 'part hash agg valu e big slow st ream quer'),
        |  (220, 173, 'part sort g roup c o l u m n'),
        |  (240, 109, 'the fast fast fast st ream slow sort g roup'),
        |  (260, 37, 'orde r part slow big hash tabl e data data'),
        |  (280, 140, 'scan wind ow valu e fast agg tabl e st'),
        |  (300, 62, 'vect or vect or st ream st ream fast the'),
        |  (320, 129, 'the big c o l u m n merg e'),
        |  (340, 73, 'batc h g roup hash g roup data row cust'),
        |  (360, 132, 'vect or valu e s mall data merg e g'),
        |  (380, 138, 'wind ow the sort s mall data st ream s'),
        |  (400, 39, 'data line line quer y batc h the slow wind'),
        |  (420, 135, 'fast merg e sort fast fast slow sort scan data'),
        |  (440, 73, 'cust omer orde r the join part sort orde r'),
        |  (460, 74, 'agg scan c o l u m n key s'),
        |  (480, 123, 'part key part orde r row orde r sort tabl'))
        |AS t(doc_id, n_pieces, head_pieces)
        |ORDER BY doc_id""".stripMargin,
    "bpe_train_merges" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS INTEGER), 'e', 'r', CAST(4568 AS BIGINT)),
        |  (1, 'i', 'n', 2760), (2, 'o', 'w', 2747), (3, 'o', 'r', 2696),
        |  (4, 's', 't', 2676), (5, 'm', 'er', 1852), (6, 'a', 't', 1845),
        |  (7, 'l', 'u', 1831), (8, 'a', 'r', 1758), (9, 'p', 'ar', 1758),
        |  (10, 'j', 'o', 964), (11, 'jo', 'in', 964))
        |AS t("rank", "left", "right", pair_count)
        |ORDER BY "rank"""".stripMargin,
    // Pinned oracle for BM25 (layout-independence by construction: the
    // 1e-9 integer grid makes every score an exact BIGINT sum; verified
    // bit-identical across 4- and 32-core layouts; == an independent
    // local reference in TextSearchSpec)
    "text_search_bm25" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(1 AS INTEGER), CAST(104 AS BIGINT), CAST(1263461994 AS BIGINT)),
        |  (0, 2, 13, 1231494190),
        |  (0, 3, 174, 1230681335),
        |  (0, 4, 293, 1199154648),
        |  (0, 5, 58, 1195515839),
        |  (1, 1, 46, 1188483708),
        |  (1, 2, 102, 1174533207),
        |  (1, 3, 352, 1172614571),
        |  (1, 4, 201, 1169190871),
        |  (1, 5, 224, 1155106128))
        |AS t(query_id, rank, doc_id, score_e9)
        |ORDER BY query_id, rank""".stripMargin,
    // hybrid_rrf_search — pinned (scripts/pin_layouts.sh: bit-identical
    // at 4 and 32 cores; both arms integer-grid, fusion is integer
    // arithmetic over arm ranks; operator == independent local replica
    // of both arms + fusion in HybridRrfSpec)
    "hybrid_rrf_search" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(1 AS INTEGER), CAST(13 AS BIGINT), CAST(32002047 AS BIGINT)),
        |  (0, 2, 202, 30092072),
        |  (0, 3, 251, 30017920),
        |  (0, 4, 58, 29469122),
        |  (0, 5, 293, 29323630),
        |  (1, 1, 352, 32002047),
        |  (1, 2, 46, 31778057),
        |  (1, 3, 216, 29910714),
        |  (1, 4, 102, 28949544),
        |  (1, 5, 417, 28860027))
        |AS t(query_id, rank, doc_id, rrf_e9)
        |ORDER BY query_id, rank""".stripMargin,
    // Pinned oracle for the TF-IDF knn (scripts/pin_layouts.sh
    // tfidf_knn — integer-grid idf makes the vectors layout-independent;
    // verified bit-identical at 4 and 32 cores; the vectorizer itself
    // is == an independent local reference in TextSearchSpec)
    "tfidf_knn" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(1 AS INTEGER), CAST(445 AS BIGINT)),
        |  (0, 2, 297), (0, 3, 412), (0, 4, 404), (0, 5, 237),
        |  (1, 1, 351), (1, 2, 218), (1, 3, 442), (1, 4, 336), (1, 5, 141),
        |  (2, 1, 163), (2, 2, 240), (2, 3, 394), (2, 4, 423), (2, 5, 420),
        |  (3, 1, 14), (3, 2, 258), (3, 3, 167), (3, 4, 13), (3, 5, 296),
        |  (4, 1, 81), (4, 2, 56), (4, 3, 251), (4, 4, 105), (4, 5, 263))
        |AS t(query_id, rank, corpus_id)
        |ORDER BY query_id, rank""".stripMargin,
    // Pinned oracle for the end-to-end approximate bridge
    // (scripts/pin_layouts.sh tfidf_ivfadc_knn — bit-identical at 4 and
    // 32 cores: the vectors are layout-independent by the integer grid
    // and IVF-ADC is deterministic by construction, decimal-sum
    // codebooks). 4/5 of each shortlist matches the exact tfidf_knn
    // top-5 — the recall loss is the documented ADC approximation, not
    // noise.
    "tfidf_ivfadc_knn" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(1 AS INTEGER), CAST(445 AS BIGINT)),
        |  (0, 2, 297), (0, 3, 412), (0, 4, 237), (0, 5, 371),
        |  (1, 1, 351), (1, 2, 218), (1, 3, 442), (1, 4, 336), (1, 5, 141),
        |  (2, 1, 163), (2, 2, 240), (2, 3, 423), (2, 4, 32), (2, 5, 251),
        |  (3, 1, 14), (3, 2, 258), (3, 3, 167), (3, 4, 13), (3, 5, 296),
        |  (4, 1, 81), (4, 2, 56), (4, 3, 251), (4, 4, 263), (4, 5, 410))
        |AS t(query_id, rank, corpus_id)
        |ORDER BY query_id, rank""".stripMargin,
    // Same pinned pattern for ENCODE: the greedy fold is order-fixed per
    // word type, the per-doc rebuild sorts by token position (a total
    // order), and the merge table above is itself pinned — verified
    // bit-identical across 4- and 32-core layouts; == a local greedy
    // reference per doc in ScalaTest (BpeTrainerSpec).
    "bpe_encode" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(102 AS BIGINT), 'k e y a g g r ow s c a n'),
        |  (10, 141, 'or d er s c a n a g g b at'),
        |  (20, 250, 'w in d ow par t s l ow c u st'),
        |  (30, 108, 'k e y r ow s or t s m a l'),
        |  (40, 277, 'or d er s c a n l in e h a'),
        |  (50, 166, 's l ow v a lu e w in d ow c'),
        |  (60, 323, 'k e y s or t d at a s c a'),
        |  (70, 328, 't h e c o lu m n c u st o'),
        |  (80, 110, 'par t a v e c t or h a s h'),
        |  (90, 74, 'r ow d at a h a s h a g g'),
        |  (100, 308, 'b at c h d at a join s c a n'),
        |  (110, 36, 's c a n mer g e par t a g g'),
        |  (120, 145, 's par k c o lu m n v e c t'),
        |  (130, 94, 's par k t a b l e b at c h'),
        |  (140, 105, 'g r o u p a g g b i g q'),
        |  (150, 165, 's or t join join v e c t or q u'),
        |  (160, 153, 'b at c h f i l t er t h e'),
        |  (170, 80, 'g r o u p c o lu m n b at'),
        |  (180, 120, 'a g g q u er y par t mer g e'),
        |  (190, 263, 't a b l e s par k f a st a'),
        |  (200, 192, 'par t h a s h a g g v a lu'),
        |  (210, 332, 'c u st o mer b at c h w in d'),
        |  (220, 355, 'par t s or t g r o u p c o'),
        |  (230, 203, 't h e q u er y v a lu e v'),
        |  (240, 254, 't h e f a st f a st f a st'),
        |  (250, 162, 'v a lu e s par k or d er f i'),
        |  (260, 89, 'or d er par t s l ow b i g h'),
        |  (270, 318, 'c o lu m n f i l t er r ow'),
        |  (280, 300, 's c a n w in d ow v a lu e'),
        |  (290, 354, 's par k s c a n s par k t a'),
        |  (300, 135, 'v e c t or v e c t or st r'),
        |  (310, 93, 'mer g e join t a b l e a s l'),
        |  (320, 255, 't h e b i g c o lu m n mer'),
        |  (330, 207, 'b i g a g g or d er t h e'),
        |  (340, 154, 'b at c h g r o u p h a s'),
        |  (350, 292, 'b at c h join s or t v a lu e'),
        |  (360, 288, 'v e c t or v a lu e s m a'),
        |  (370, 158, 'par t s par k t a b l e or d'),
        |  (380, 288, 'w in d ow t h e s or t s m'),
        |  (390, 86, 's l ow b at c h r ow a a t'),
        |  (400, 86, 'd at a l in e l in e q u er'),
        |  (410, 262, 'r ow or d er a t a b l e w'),
        |  (420, 289, 'f a st mer g e s or t f a st'),
        |  (430, 259, 'c u st o mer s or t v a lu e'),
        |  (440, 153, 'c u st o mer or d er t h e join'),
        |  (450, 93, 't h e s par k q u er y s l'),
        |  (460, 172, 'a g g s c a n c o lu m n'),
        |  (470, 148, 'a g g c u st o mer k e y b'),
        |  (480, 233, 'par t k e y par t or d er r ow'),
        |  (490, 177, 'w in d ow q u er y a t h e'))
        |AS t(doc_id, n_bpe, head_syms)
        |ORDER BY doc_id""".stripMargin,
    "dedup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents),
        |g AS (SELECT doc_id, i AS p,
        |        md5(array_to_string(list_slice(words, i, i + 7), ' ')) AS gram
        |      FROM t, LATERAL unnest(range(1, greatest(len(words) - 6, 1)))
        |             AS u(i)),
        |d AS (SELECT gram, min(doc_id) AS keeper FROM g GROUP BY gram
        |      HAVING count(DISTINCT doc_id) > 1),
        |cov AS (SELECT DISTINCT g.doc_id, v.pos
        |        FROM g JOIN d USING (gram),
        |             LATERAL unnest(range(g.p, g.p + 8)) AS v(pos)
        |        WHERE g.doc_id <> d.keeper),
        |pos AS (SELECT t.doc_id, i AS pos, words[CAST(i AS INT)] AS w
        |        FROM t, LATERAL unnest(range(1, len(words) + 1)) AS u(i)),
        |kept AS (SELECT pos.doc_id,
        |           string_agg(pos.w, ' ' ORDER BY pos.pos) AS text_clean,
        |           count(*) AS n_kept
        |         FROM pos LEFT JOIN cov
        |           ON cov.doc_id = pos.doc_id AND cov.pos = pos.pos
        |         WHERE cov.doc_id IS NULL GROUP BY pos.doc_id)
        |SELECT t.doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
        |  CAST(len(words) - coalesce(n_kept, 0) AS BIGINT) AS n_dup_tokens,
        |  coalesce(text_clean, '') AS text_clean
        |FROM t LEFT JOIN kept USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |       t -> list_contains(['the','a','of','and','to','in','is'], t))) AS BIGINT) AS n_stopwords,
        |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
        |  CASE WHEN len(string_split_regex(trim(text), '\s+')) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |              t -> list_contains(['the','a','of','and','to','in','is'], t))) AS DOUBLE)
        |            / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) END AS stopword_ratio,
        |  CASE WHEN len(string_split_regex(trim(text), '\s+')) = 0 THEN 0.0
        |       ELSE CAST(length(text) AS DOUBLE)
        |            / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) END AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_id" -> {
      val en = markerSql(TextFunctions.stopwords("en"))
      val es = markerSql(TextFunctions.stopwords("es"))
      val de = markerSql(TextFunctions.stopwords("de"))
      val fr = markerSql(TextFunctions.stopwords("fr"))
      s"""SELECT doc_id, lang AS lang_label,
         |  CASE WHEN $en + $es + $de + $fr = 0 THEN 'und'
         |       WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
         |       WHEN $es >= $de AND $es >= $fr THEN 'es'
         |       WHEN $de >= $fr THEN 'de'
         |       ELSE 'fr' END AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "fingerprint" ->
      s"SELECT doc_id, md5($normTextSql) AS fp FROM documents ORDER BY doc_id",
    "token_counts" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
        |  CASE WHEN trim(text) = '' THEN 0.0
        |       ELSE CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS DOUBLE)
        |            / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) END AS bpe_per_word
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      s"""SELECT md5($normTextSql) AS text_hash, MIN(doc_id) AS keep_id,
         |       COUNT(*) AS n_dups
         |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,
    "dedup_exact_kept" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5($normTextSql))
         |ORDER BY doc_id""".stripMargin,
    "dedup_minhash_pairs" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS shingles
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |  CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,
    "curate_pipeline" ->
      s"""WITH stats AS (
         |  SELECT doc_id, lang, text,
         |    CASE WHEN trim(text) = '' THEN 0
         |         ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
         |    len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
         |        t -> list_contains(['the','a','of','and','to','in','is'], t))) AS n_stop
         |  FROM documents
         |), gated AS (
         |  SELECT * FROM stats
         |  WHERE n_tokens >= 5
         |    AND (CASE WHEN n_tokens = 0 THEN 0.0
         |         ELSE CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) END) <= 0.6
         |), kept AS (
         |  SELECT * FROM gated
         |  WHERE doc_id IN (SELECT MIN(doc_id) FROM gated GROUP BY md5($normTextSql))
         |)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_bpe
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    // Per-bit brute force: the md5-nibble arithmetic reproduces
    // Md5Hash.hash64 bit-exactly; hamming is summed bitwise so no 64-bit
    // unsigned value is ever constructed. Empty-token docs get all-ones
    // signatures on both sides (COALESCE(w,0) >= 0 == acc(b)=0 → bit 1).
    "dedup_simhash_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, t FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |    FROM documents) WHERE t <> ''
        |), votes AS (
        |  SELECT doc_id, r.b,
        |    SUM(CASE WHEN ((strpos('0123456789abcdef',
        |          substr(md5(t), 16 - (r.b // 4), 1)) - 1) >> (r.b % 4)) & 1 = 1
        |        THEN 1 ELSE -1 END) AS w
        |  FROM tok CROSS JOIN range(0, 64) AS r(b)
        |  GROUP BY doc_id, r.b
        |), bits AS (
        |  SELECT d.doc_id, r.b,
        |    CASE WHEN COALESCE(v.w, 0) >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM documents d CROSS JOIN range(0, 64) AS r(b)
        |  LEFT JOIN votes v ON v.doc_id = d.doc_id AND v.b = r.b
        |)
        |SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
        |  CAST(SUM(CASE WHEN a.bit <> b2.bit THEN 1 ELSE 0 END) AS INTEGER) AS hamming
        |FROM bits a JOIN bits b2 ON a.b = b2.b AND a.doc_id < b2.doc_id
        |GROUP BY 1, 2
        |HAVING SUM(CASE WHEN a.bit <> b2.bit THEN 1 ELSE 0 END) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // Brute-force distinct word-3-shingle Jaccard over all pairs — a REAL
    // oracle for the exact prefix-filter join (no recall caveat: the
    // algorithm is exact by construction). Integer cross-multiplied
    // threshold (2·|∩| >= |∪|) in both engines; jaccard emitted as the
    // same int/int IEEE division.
    "dedup_jaccard_exact" ->
      s"""WITH t0 AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents WHERE trim(text) <> ''
         |), tk AS (
         |  SELECT doc_id, $shinglesSql AS s FROM t0
         |), pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_intersect(a.s, b.s)) AS inter,
         |    len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
         |  FROM tk a JOIN tk b ON a.doc_id < b.doc_id
         |)
         |SELECT id_a, id_b,
         |  CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
         |FROM pairs WHERE 2 * inter >= uni
         |ORDER BY id_a, id_b""".stripMargin,
    // Brute-force distinct char-5-gram Jaccard over all pairs; int-size
    // division → bit-exact doubles (same trick as minhash).
    "dedup_ngram_pairs" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN length(text) <= 5 THEN [text]
        |      ELSE list_transform(range(1, length(text) - 3),
        |             i -> substr(text, i, 5)) END) AS grams
        |  FROM documents
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |  CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jaccard
        |FROM g a JOIN g b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_cluster" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, $shinglesSql AS shingles
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
         |), pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.8
         |), edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach(v, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.v = e.v
         |)
         |SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach
         |GROUP BY v ORDER BY doc_id""".stripMargin,
    "dedup_cluster_kept" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, $shinglesSql AS shingles
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
         |), pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.8
         |), edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach(v, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.v = e.v
         |)
         |SELECT doc_id FROM (
         |  SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v)
         |WHERE doc_id = cluster_id ORDER BY doc_id""".stripMargin,
    "dedup_cluster_best" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, $shinglesSql AS shingles
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
         |), pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.8
         |), edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs
         |), reach(v, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.u, reach.r FROM edges e JOIN reach ON reach.v = e.v
         |), labeled AS (
         |  SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v
         |), ranked AS (
         |  SELECT l.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY l.cluster_id
         |      ORDER BY d.n_chars DESC, l.doc_id) AS rn
         |  FROM labeled l JOIN documents d USING (doc_id)
         |)
         |SELECT doc_id FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "dedup_minhash_kept" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $shinglesSql AS shingles
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents)
         |), dropped AS (
         |  SELECT DISTINCT b.doc_id AS doc_id
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.8
         |)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |ORDER BY doc_id""".stripMargin,
    // exact because sketch capacity (256) > fixture vocabulary size
    "freq_tokens" ->
      """SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |      FROM documents)
        |WHERE tok <> ''
        |GROUP BY tok ORDER BY cnt DESC, token""".stripMargin,
    "rare_token_score" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents
        |), t2 AS (
        |  SELECT doc_id, tok FROM t WHERE tok <> ''
        |), c AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM t2 GROUP BY tok
        |)
        |SELECT t2.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(tf) AS BIGINT) AS freq_mass
        |FROM t2 JOIN c USING (tok)
        |GROUP BY t2.doc_id ORDER BY doc_id""".stripMargin
  )
}
