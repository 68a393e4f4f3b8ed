package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** Incremental DSIR quality gate — the data-SELECTION member of the
  * ingest-time index family ([[IncrementalSearchIndex]] /
  * [[IncrementalAnnIndex]] / [[IncrementalDedup]]): the raw-corpus
  * hashed unigram LM accumulates epoch by epoch as documents arrive,
  * and any document set can be importance-scored against the frozen
  * TARGET LM + the raw LM as ingested so far — data selection as a
  * continuously-maintained artifact instead of a batch sweep.
  *
  * Layout under `cfg.dir`:
  *
  *   - `target/` — the target corpus's (bucket, cnt) rows, written ONCE
  *     by [[initTarget]] (the reference distribution is fixed by
  *     definition; re-init overwrites).
  *   - `counts/epoch=N/` — the epoch's raw (bucket, cnt) rows: ≤ dim
  *     rows per epoch, the cheapest state in the index family. The
  *     job-commit `_SUCCESS` file is the replay marker AND the probe
  *     fence: half-written epochs neither skip their retry nor leak
  *     into scoring.
  *
  * The accumulated raw LM is the BUCKET-WISE SUM over committed epochs
  * — exact integer addition, so after ingesting epochs 1..E the grid
  * ratio table equals what batch [[Dsir]] computes on the union corpus,
  * and [[score]] returns BIT-IDENTICAL weights to the batch operator
  * (asserted in the spec). At 100 TB the state read per scoring call is
  * E·dim integer rows — independent of corpus size. */
object IncrementalDsirGate {

  final case class Config(dir: String, dim: Int = 256, alpha: Double = 1.0)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Freeze the target LM (bucket counts) — call once at gate setup. */
  def initTarget(cfg: Config, target: DataFrame, idCol: String,
      textCol: String): Unit =
    Dsir.hashedCounts(target, idCol, textCol, cfg.dim)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(s"${cfg.dir}/target")

  /** Fold one epoch's documents into the raw LM. Idempotent per
    * epochId: the job-commit `_SUCCESS` file is the replay marker — a
    * crashed half-written epoch dir is NOT treated as landed, and the
    * retry's overwrite replaces it whole (the stats-written-last
    * protocol of the other indexes, with the commit file playing the
    * stats role since counts are a single atomic write). */
  def ingestBatch(cfg: Config, batch: DataFrame, idCol: String,
      textCol: String, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val dir = s"${cfg.dir}/counts/epoch=$epochId"
    if (fs(spark, cfg.dir).exists(new Path(s"$dir/_SUCCESS"))) return
    Dsir.hashedCounts(batch, idCol, textCol, cfg.dim)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** COMMITTED state only (the r8 fencing rule): a dir counts iff its
    * job-commit `_SUCCESS` exists — a half-written epoch (crash between
    * task files and commit) is invisible to probes until its retry
    * lands whole. */
  private def committedDirs(spark: SparkSession, base: String): Seq[String] = {
    val f = fs(spark, base)
    val p = new Path(base)
    if (!f.exists(p)) Seq.empty
    else if (f.exists(new Path(p, "_SUCCESS"))) Seq(base)
    else f.listStatus(p).toSeq
      .filter(s => s.isDirectory &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.toString)
  }

  private def totals(spark: SparkSession, path: String, dim: Int):
      Array[Long] = {
    val a = new Array[Long](dim)
    val dirs = committedDirs(spark, path)
    if (dirs.nonEmpty)
      spark.read.parquet(dirs: _*)
        .groupBy("bucket").agg(sum("cnt").as("cnt")).collect()
        .foreach(r => a(r.getInt(0)) = r.getLong(1))
    a
  }

  /** floor(1e9·log-ratio) per bucket from the state as ingested so far
    * — exactly [[Dsir.logRatioGrid]] over the accumulated counts. */
  def currentRatioGrid(cfg: Config, spark: SparkSession): Array[Long] =
    Dsir.logRatioGrid(
      totals(spark, s"${cfg.dir}/counts", cfg.dim),
      totals(spark, s"${cfg.dir}/target", cfg.dim), cfg.alpha)

  /** (idCol, w9): exact-grid importance weight of `docs` under the
    * gate's current state — bit-identical to batch
    * [[Dsir.importanceWeights]] over the union of ingested epochs. */
  def score(cfg: Config, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ratioCol = lit(currentRatioGrid(cfg, docs.sparkSession))
    val summed = Dsir.hashedCounts(docs, idCol, textCol, cfg.dim)
      .groupBy(idCol)
      .agg(sum(col("cnt") * element_at(ratioCol, col("bucket") + 1))
        .as("w9"))
    docs.select(col(idCol)).join(summed, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("w9"), lit(0L)).as("w9"))
  }

  /** Registry sink: each streaming epoch (or batch run, as epoch 0)
    * folds into the raw LM. */
  final case class DsirGateSink(cfg: Config, idCol: String,
      textCol: String) extends graft.sources.Connectors.EpochSink {
    def writeEpoch(df: DataFrame, epochId: Long): Unit =
      ingestBatch(cfg, df, idCol, textCol, epochId)
  }
}
