package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TextSearch
import graft.streaming.GenStore.Side

/** Incremental BM25 search index — the text counterpart of
  * [[IncrementalAnnIndex]]: documents are indexed at ingest into a
  * persistent term-partitioned postings table, and keyword queries probe
  * only the partitions their terms hash into — never a corpus scan, and
  * never a rebuild of postings already written.
  *
  * Layout under `cfg.dir`:
  *
  *   - `postings/epoch=N/` — (term, doc_id, dl, tf), partitioned by
  *     `t_mod = pmod(hash(term), hashBuckets)` and bucket-repartitioned
  *     before the write so each epoch lands ONE file per touched bucket
  *     (r15: the r14 link-index layout lesson — without the repartition
  *     every writer task emits a file into every bucket dir, tasks ×
  *     buckets small files per epoch, and probe listing cost grows with
  *     ingest history). A term's postings land in the same `t_mod`
  *     value in EVERY epoch and generation, so a probe reads only the
  *     query terms' `t_mod` partitions and the document frequency
  *     computed from what it reads is complete.
  *   - `stats/epoch=N/` — one row (n_docs, sum_dl) per epoch; probes sum
  *     them for the global N and avgdl. Written LAST: it is the epoch's
  *     replay marker, `_SUCCESS`-fenced on both sides.
  *   - `postings-compact/gen=G/` + `stats-compact/gen=G/` — compaction
  *     generations ([[GenStore]]: size-tiered folds, marker-written-last
  *     adoption, grace-windowed [[gc]]). Folding collapses epochs ×
  *     buckets files to buckets; probes are bit-identical across the
  *     swap because the view is the same postings union and the scoring
  *     tail is layout-independent. Epoch stats markers are NEVER folded
  *     or removed — they carry the N/avgdl sums and the replay fence.
  *
  * Scoring is [[TextSearch.scoreBm25]] — identical integer-grid BM25 to
  * the batch operator, so `probe` over E ingested epochs returns EXACTLY
  * what `bm25TopK` would on the union corpus (asserted in the spec and
  * by the `bm25_incr_probe` / `bm25_incr_compact_probe` gate rows).
  * Ingest contract: document ids are unique across epochs (re-ingesting
  * a doc id would double-count it, as in any append-only index).
  */
object IncrementalSearchIndex {

  final case class Config(dir: String, hashBuckets: Int = 64,
      k1: Double = 1.2, b: Double = 0.75)

  private def sides(cfg: Config) = Seq(
    Side("postings", "t_mod", cfg.hashBuckets,
      Seq("term", "doc_id", "dl", "tf")))

  /** Index one epoch of (idCol, textCol) documents. Idempotent per
    * epochId: a job-committed `stats/epoch=N` means the epoch fully
    * landed. */
  def ingestBatch(cfg: Config, batch: DataFrame, idCol: String,
      textCol: String, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val marker = s"${cfg.dir}/stats/epoch=$epochId"
    if (GenStore.hasSuccess(spark, marker)) return
    val docs = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .localCheckpoint(eager = true)
    TextSearch.postings(docs, "doc_id", "text")
      .withColumn("t_mod",
        pmod(hash(col("term")), lit(cfg.hashBuckets)).cast("long"))
      .repartition(cfg.hashBuckets, col("t_mod"))
      .write.mode("overwrite").partitionBy("t_mod")
      .parquet(s"${cfg.dir}/postings/epoch=$epochId")
    // stats row counts EVERY doc (term-less docs too — they contribute
    // to N and avgdl exactly as in the batch operator); marker, so last
    docs.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(TextFunctions.tokens(col("text")))), lit(0L))
          .as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(marker)
  }

  /** foreachBatch hook for a document stream. */
  def sink(cfg: Config, idCol: String, textCol: String)
      : (DataFrame, Long) => Unit =
    (batch, epochId) => ingestBatch(cfg, batch, idCol, textCol, epochId)

  /** Registry sink (`search-index`): the same ingest, config-driven —
    * a transporter-style pipeline can declare ingest-time search
    * indexing as a sink row. Epoch-keyed idempotency via EpochSink. */
  final case class SearchIndexSink(cfg: Config, idCol: String,
      textCol: String,
      maintain: Option[Maintenance.Policy] = None)
      extends graft.sources.Connectors.EpochSink {
    def writeEpoch(df: DataFrame, epochId: Long): Unit = {
      ingestBatch(cfg, df, idCol, textCol, epochId)
      maintain.foreach(p => maintainIfDue(df.sparkSession, cfg, p))
    }
  }

  /** Policy-gated maintenance pass (tiered compact + gc) — skip loudly
    * on a held claim ([[Maintenance.maybeRun]]). */
  def maintainIfDue(spark: SparkSession, cfg: Config,
      pol: Maintenance.Policy): Boolean =
    Maintenance.maybeRun(spark, cfg.dir, Seq("postings"),
        GenStore.markedEpochs(spark, s"${cfg.dir}/stats"), pol) {
      compact(spark, cfg, pol.sizeRatio)
      gc(spark, cfg, pol.graceMs)
    }

  /** BM25 top-k of each (query_id, query_text) row against everything
    * ingested so far: touched-partition postings read (generations ∪
    * remainder epochs, one consistent [[GenStore.GenView]]) → shared
    * scoring tail. Output (query_id, rank, doc_id, score_e9), best
    * first. */
  def probe(spark: SparkSession, cfg: Config, queries: DataFrame,
      queryIdCol: String, queryTextCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(Long, Int, Long, Long)]
      .toDF("query_id", "rank", "doc_id", "score_e9")
    // committed epochs = those with a job-committed stats marker (stats
    // is written LAST). A crash between the postings write and the
    // stats write leaves a half-landed epoch whose postings must NOT
    // score: its docs would be ranked while N/avgdl exclude them. The
    // whole probe therefore fences to ONE view of the committed list.
    val committed = GenStore.markedEpochs(spark, s"${cfg.dir}/stats")
    if (committed.isEmpty) return empty

    val qTerms = TextSearch.queryTerms(queries, queryIdCol, queryTextCol)
      .localCheckpoint(eager = true) // drives the prune AND the join
    val touched = qTerms
      .select(pmod(hash(col("term")), lit(cfg.hashBuckets)).cast("long")
        .as("m"))
      .distinct().collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) return empty

    val stats = spark.read
      .option("basePath", s"${cfg.dir}/stats")
      .parquet(s"${cfg.dir}/stats")
      .filter(col("epoch").isin(committed: _*))
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("sumdl"))
      .collect()(0)
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n.toDouble

    val v = GenStore.view(spark, cfg.dir, committed)
    val pres = GenStore.sidePresence(spark, v, "postings")
    GenStore.sideRead(spark, v, "postings", pres,
        Seq("t_mod", "term", "doc_id", "dl", "tf")) match {
      case None => empty // every committed epoch was term-less
      case Some(post) =>
        TextSearch.scoreBm25(
          post.filter(col("t_mod").isin(touched: _*))
            .select("term", "doc_id", "dl", "tf"),
          qTerms, n, avgdl, cfg.k1, cfg.b, k)
    }
  }

  /** Fold committed epochs (and size-ratio-admissible generations) into
    * a new postings generation — [[GenStore.compact]]; the epoch stats
    * markers (N/avgdl + replay fence) are never folded. */
  def compact(spark: SparkSession, cfg: Config,
      sizeRatio: Double = Double.PositiveInfinity)
      : Option[GenStore.CompactStats] =
    GenStore.compact(spark, cfg.dir, sides(cfg),
      GenStore.markedEpochs(spark, s"${cfg.dir}/stats"), sizeRatio)

  /** Reclaim superseded postings files, grace-windowed
    * ([[GenStore.gc]]); epoch dirs and stats markers remain. */
  def gc(spark: SparkSession, cfg: Config,
      graceMs: Long = 3600000L): Unit =
    GenStore.gc(spark, cfg.dir, Seq("postings"), graceMs)
}
