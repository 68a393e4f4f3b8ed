package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TextSearch

/** Incremental BM25 search index — the text counterpart of
  * [[IncrementalAnnIndex]]: documents are indexed at ingest into a
  * persistent term-partitioned postings table, and keyword queries probe
  * only the partitions their terms hash into — never a corpus scan, and
  * never a rebuild of postings already written.
  *
  * Layout under `cfg.dir`:
  *
  *   - `postings/epoch=N/` — (term, doc_id, dl, tf), partitioned by
  *     `t_mod = pmod(hash(term), hashBuckets)`. A term's postings land in
  *     the same `t_mod` value in EVERY epoch, so a probe reads only the
  *     query terms' `t_mod` partitions across all epochs and nothing
  *     else — and the document frequency computed from what it reads is
  *     complete.
  *   - `stats/epoch=N/` — one row (n_docs, sum_dl) per epoch; probes sum
  *     them for the global N and avgdl. Written LAST: it is the epoch's
  *     replay marker (the [[IncrementalAnnIndex]] idempotency protocol).
  *
  * Scoring is [[TextSearch.scoreBm25]] — identical integer-grid BM25 to
  * the batch operator, so `probe` over E ingested epochs returns EXACTLY
  * what `bm25TopK` would on the union corpus (asserted in the spec).
  * Ingest contract: document ids are unique across epochs (re-ingesting
  * a doc id would double-count it, as in any append-only index).
  */
object IncrementalSearchIndex {

  final case class Config(dir: String, hashBuckets: Int = 64,
      k1: Double = 1.2, b: Double = 0.75)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Index one epoch of (idCol, textCol) documents. Idempotent per
    * epochId: a present `stats/epoch=N` means the epoch fully landed. */
  def ingestBatch(cfg: Config, batch: DataFrame, idCol: String,
      textCol: String, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val marker = s"${cfg.dir}/stats/epoch=$epochId"
    if (fs(spark, cfg.dir).exists(new Path(marker))) return
    val docs = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .localCheckpoint(eager = true)
    TextSearch.postings(docs, "doc_id", "text")
      .withColumn("t_mod",
        pmod(hash(col("term")), lit(cfg.hashBuckets)).cast("long"))
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
      textCol: String) extends graft.sources.Connectors.EpochSink {
    def writeEpoch(df: DataFrame, epochId: Long): Unit =
      ingestBatch(cfg, df, idCol, textCol, epochId)
  }

  /** BM25 top-k of each (query_id, query_text) row against everything
    * ingested so far: touched-partition postings read → shared scoring
    * tail. Output (query_id, rank, doc_id, score_e9), best first. */
  def probe(spark: SparkSession, cfg: Config, queries: DataFrame,
      queryIdCol: String, queryTextCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(Long, Int, Long, Long)]
      .toDF("query_id", "rank", "doc_id", "score_e9")
    val f = fs(spark, cfg.dir)
    if (!f.exists(new Path(s"${cfg.dir}/postings")) ||
        !f.exists(new Path(s"${cfg.dir}/stats"))) return empty

    val qTerms = TextSearch.queryTerms(queries, queryIdCol, queryTextCol)
      .localCheckpoint(eager = true) // drives the prune AND the join
    val touched = qTerms
      .select(pmod(hash(col("term")), lit(cfg.hashBuckets)).cast("long")
        .as("m"))
      .distinct().collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) return empty

    // committed epochs = those with a stats dir (stats is written LAST —
    // the replay marker). A crash between the postings write and the
    // stats write leaves a half-landed epoch whose postings must NOT
    // score: its docs would be ranked while N/avgdl exclude them. The
    // probe therefore fences the postings read to the stats epoch list
    // (partition-pruned — `epoch` is a partition column on both reads).
    val committed = f.listStatus(new Path(s"${cfg.dir}/stats")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong)
    if (committed.isEmpty) return empty

    val stats = spark.read.parquet(s"${cfg.dir}/stats")
      .agg(sum(col("n_docs")).as("n"), sum(col("sum_dl")).as("sumdl"))
      .collect()(0)
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n.toDouble

    val post = spark.read.parquet(s"${cfg.dir}/postings")
      .filter(col("epoch").isin(committed: _*))
      .filter(col("t_mod").isin(touched: _*))
      .select("term", "doc_id", "dl", "tf")
    TextSearch.scoreBm25(post, qTerms, n, avgdl, cfg.k1, cfg.b, k)
  }
}
