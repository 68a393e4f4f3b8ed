package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Incremental near-duplicate detection at ingest — the continuous form
  * of `Dedup.minhashPairs`: a persistent MinHash index that every
  * arriving epoch joins against, so a document duplicating ANYTHING ever
  * ingested is caught at arrival, without rescanning the corpus.
  *
  * The index is two parquet table dirs under `cfg.dir`:
  *
  *   - `bands/` — (doc_id, band_idx, band_hash), hash-bucketed by
  *     `bh_mod = pmod(band_hash, hashBuckets)` as a PARTITION column: an
  *     epoch's candidate join first collects the ≤ hashBuckets distinct
  *     `bh_mod` values its batch touches (bounded driver data, same
  *     pattern as the upsert sink's touched buckets) and reads ONLY
  *     those partitions — at 100 TB the per-epoch read is proportional
  *     to the batch's bucket spread, never the index;
  *   - `sigs/` — (doc_id, sig), hash-partitioned the same way by
  *     `did_mod = pmod(xxhash64(doc_id), hashBuckets)`; verification
  *     joins read only the partitions holding the epoch's matched ids.
  *
  * Verification is ESTIMATED Jaccard — the fraction of equal signature
  * slots (±~1/√numHashes ≈ 0.09 at 128 hashes) — because the index by
  * design does not keep document text. This is the standard trade for
  * online dedup; the batch operator remains the exact-verify variant.
  *
  * Epoch protocol (at-least-once safe): every write lands under
  * `epoch=<id>` subdirs; a replayed epoch sees its dir already present
  * and SKIPS — decisions and index contents are idempotent. Only KEPT
  * documents enter the index, so duplicate chains collapse onto their
  * surviving representative exactly like `minhashKept`.
  */
object IncrementalDedup {

  final case class Config(dir: String, shingleK: Int = 3,
      numHashes: Int = 128, bands: Int = 32, estThreshold: Double = 0.8,
      hashBuckets: Int = 64, maxBucketSize: Int = 1000)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Process one epoch: decide kept/dropped for every batch doc, append
    * kept docs to the index, write decisions. Idempotent per epochId. */
  def ingestBatch(cfg: Config, batch: DataFrame, idCol: String,
      textCol: String, epochId: Long): Unit = {
    val spark = batch.sparkSession
    val decDir = s"${cfg.dir}/decisions/epoch=$epochId"
    if (fs(spark, cfg.dir).exists(new Path(decDir))) return // replay: done

    val sigs = Dedup.signatures(batch, idCol, textCol, cfg.shingleK,
      cfg.numHashes)
      .select(col(idCol).as("doc_id"), col("sig"))
      .localCheckpoint(eager = true) // one signature pass per epoch
    val bands = Dedup.bandRows(sigs, "doc_id", cfg.numHashes, cfg.bands)
      .withColumn("bh_mod", pmod(col("band_hash"), lit(cfg.hashBuckets)))

    // prune the index read to the batch's touched hash buckets (bounded:
    // ≤ hashBuckets ints on the driver)
    val touched = bands.select("bh_mod").distinct()
      .collect().map(_.getLong(0)).toSet
    val bandsDir = s"${cfg.dir}/bands"
    val haveIndex = fs(spark, cfg.dir).exists(new Path(bandsDir))
    // `epoch =!= epochId` excludes THIS epoch's own partial write: a crash
    // after the bands append (below) but before the decisions marker means
    // replay re-reads the index — without the fence every kept batch doc
    // would band-match its own index entry (est_jaccard = 1.0) and be
    // dropped as a duplicate of itself
    val oldBands =
      if (!haveIndex) None
      else Some(spark.read.parquet(bandsDir)
        .filter(col("epoch") =!= lit(epochId))
        .filter(col("bh_mod").isin(touched.toSeq: _*)))

    // candidates: batch × index plus batch × batch (smaller id first)
    val newB = bands.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("id_new"))
    val crossCand = oldBands.map { ob =>
      newB.join(ob.select(col("band_idx"), col("band_hash"),
          col("doc_id").as("id_old")),
        Seq("band_idx", "band_hash"))
        .filter(col("id_new") =!= col("id_old")) // belt-and-braces vs self
        .select("id_new", "id_old").distinct()
    }
    // intra-batch candidates run through the SAME capped bucket pass as
    // the batch operator — a flooded band bucket inside one epoch is
    // dropped (auditable), never quadratic
    val selfCand = Dedup.bucketPairs(bands, Seq("band_idx", "band_hash"),
        "doc_id", cfg.maxBucketSize)
      .select(col("id_a").as("id_keep"), col("id_b").as("id_drop"))

    // estimated Jaccard = fraction of equal signature slots
    def estimate(cand: DataFrame, aCol: String, bCol: String,
        aSigs: DataFrame, bSigs: DataFrame): DataFrame =
      cand
        .join(aSigs.select(col("doc_id").as(aCol), col("sig").as("sig_a")),
          Seq(aCol))
        .join(bSigs.select(col("doc_id").as(bCol), col("sig").as("sig_b")),
          Seq(bCol))
        .withColumn("est_jaccard",
          aggregate(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") /
            lit(cfg.numHashes.toDouble))
        .filter(col("est_jaccard") >= cfg.estThreshold)

    // the sigs table is hash-partitioned by pmod(xxhash64(doc_id), N):
    // verification reads only the partitions holding this epoch's
    // matched ids (bounded collect of ≤ hashBuckets mod values), never
    // the whole index
    val sigsDir = s"${cfg.dir}/sigs"
    val crossHits = crossCand.map { c0 =>
      val c = c0.localCheckpoint(true) // drives the prune AND the join
      val oldMods = c
        .select(pmod(xxhash64(col("id_old")), lit(cfg.hashBuckets)).as("m"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val oldSigs = spark.read.parquet(sigsDir)
        .filter(col("epoch") =!= lit(epochId)) // same crash-replay fence
        .filter(col("did_mod").isin(oldMods: _*))
      estimate(c, "id_new", "id_old", sigs, oldSigs)
        .select(col("id_new").as("doc_id"), col("id_old").as("dup_of"),
          col("est_jaccard"))
    }
    val selfHits = estimate(selfCand, "id_keep", "id_drop", sigs, sigs)
      .select(col("id_drop").as("doc_id"), col("id_keep").as("dup_of"),
        col("est_jaccard"))

    val hits = crossHits.map(_.union(selfHits)).getOrElse(selfHits)
      .groupBy("doc_id")
      .agg(min(col("dup_of")).as("dup_of"),
        max(col("est_jaccard")).as("est_jaccard"))
      .localCheckpoint(eager = true) // decisions drive two writes below

    val decisions = sigs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNull.as("kept"),
        col("dup_of"), col("est_jaccard"))

    // write order matters: the index appends go FIRST and the decisions
    // dir (the replay marker this function checks on entry) goes LAST,
    // all in overwrite mode — a crash anywhere re-runs the whole epoch
    // and overwrites any half-written dirs, so replay is idempotent.
    val kept = sigs.join(
      decisions.filter(col("kept")).select("doc_id"), Seq("doc_id"))
    kept.withColumn("did_mod",
        pmod(xxhash64(col("doc_id")), lit(cfg.hashBuckets)))
      .write.mode("overwrite").partitionBy("did_mod")
      .parquet(s"$sigsDir/epoch=$epochId")
    Dedup.bandRows(kept, "doc_id", cfg.numHashes, cfg.bands)
      .withColumn("bh_mod", pmod(col("band_hash"), lit(cfg.hashBuckets)))
      .write.mode("overwrite").partitionBy("bh_mod")
      .parquet(s"$bandsDir/epoch=$epochId")
    decisions.write.mode("overwrite").parquet(decDir)
  }

  /** All decisions so far (doc_id, kept, dup_of, est_jaccard, epoch). */
  def decisions(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.option("basePath", s"${cfg.dir}/decisions")
      .parquet(s"${cfg.dir}/decisions")

  /** foreachBatch hook: `stream.writeStream.foreachBatch(
    * IncrementalDedup.sink(cfg, "doc_id", "text"))`. */
  def sink(cfg: Config, idCol: String, textCol: String)
      : (DataFrame, Long) => Unit =
    (batch, epochId) => ingestBatch(cfg, batch, idCol, textCol, epochId)

  /** Registry sink (`dedup-index`): config-driven ingest-time dedup —
    * kept/dropped decisions land under the index dir per epoch. */
  final case class DedupIndexSink(cfg: Config, idCol: String,
      textCol: String) extends graft.sources.Connectors.EpochSink {
    def writeEpoch(df: DataFrame, epochId: Long): Unit =
      ingestBatch(cfg, df, idCol, textCol, epochId)
  }
}
