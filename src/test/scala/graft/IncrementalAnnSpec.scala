package graft

import org.apache.spark.sql.functions._
import graft.streaming.IncrementalAnnIndex
import graft.operators.Similarity

/** Incremental LSH index probes == whole-index probes; recall vs exact
  * brute force matches the batch LSH contract; epochs idempotent. */
class IncrementalAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private val dim = 64

  test("three-epoch ingest, probe, recall vs brute force, idempotent replay") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann").toString
    val cfg = IncrementalAnnIndex.Config(s"$tmp/index", dim = dim)
    (0 until 3).foreach { e =>
      IncrementalAnnIndex.ingestBatch(cfg,
        emb.filter(col("vec_id") % 3 === e), "vec_id", "embedding", e.toLong)
    }
    val queries = emb.filter(col("vec_id") < 8)
    val k = 10
    val got = IncrementalAnnIndex.topK(spark, cfg, queries,
        "vec_id", "embedding", k)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // exact brute-force truth over the whole corpus
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // same recall contract as the batch lshTopK path: most of the true
    // top-k surfaces through the banded probes
    val recalls = truth.map { case (qid, t) =>
      got.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size }
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean recall ${recalls.sum / recalls.size}")
    // every returned neighbor is real (exists in the corpus, not self)
    got.foreach { case (qid, ids) =>
      assert(!ids.contains(qid) && ids.nonEmpty && ids.size <= k)
    }

    // replaying an epoch is a no-op (marker dir)
    IncrementalAnnIndex.ingestBatch(cfg,
      emb.filter(col("vec_id") % 3 === 1), "vec_id", "embedding", 1L)
    val again = IncrementalAnnIndex.topK(spark, cfg, queries,
        "vec_id", "embedding", k)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(again == got)

    // the touched-partition prune is lossless: every index bucket row
    // sharing a band key with some query lives in a touched bb_mod
    // partition (same hash on both sides), so the pruned read sees the
    // complete candidate set
    val qKeys = got.keySet // queries that returned neighbors
    assert(qKeys.nonEmpty)
    val idxKeys = spark.read.parquet(s"${cfg.dir}/buckets")
      .select(col("band_idx"), col("band_bits"),
        pmod(hash(col("band_idx"), col("band_bits")), lit(64))
          .cast("long").as("recomputed"))
      .filter(col("recomputed") =!= col("bb_mod"))
    assert(idxKeys.count() == 0, "bb_mod must equal the probe-side hash")
  }

  test("querying an empty index returns no neighbors, not an exception") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann0").toString
    val cfg = IncrementalAnnIndex.Config(s"$tmp/index", dim = dim)
    val queries = emb.filter(col("vec_id") < 3)
    val out = IncrementalAnnIndex.topK(spark, cfg, queries,
      "vec_id", "embedding", 5)
    assert(out.columns.toSeq == Seq("query_id", "corpus_id", "sim"))
    assert(out.count() == 0)
    // and after one real epoch the same call starts answering
    IncrementalAnnIndex.ingestBatch(cfg,
      emb.filter(col("vec_id") >= 3), "vec_id", "embedding", 0L)
    assert(IncrementalAnnIndex.topK(spark, cfg, queries,
      "vec_id", "embedding", 5).count() > 0)
  }

  test("pre-stats legacy layout fails loudly; backfill restores probes in place") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-annleg").toString
    val cfg = IncrementalAnnIndex.Config(s"$tmp/index", dim = dim)
    (0 until 2).foreach { e =>
      IncrementalAnnIndex.ingestBatch(cfg,
        emb.filter(col("vec_id") % 2 === e), "vec_id", "embedding", e.toLong)
    }
    val queries = emb.filter(col("vec_id") < 8)
    def probe() = IncrementalAnnIndex.topK(spark, cfg, queries,
        "vec_id", "embedding", 10)
      .as[(Long, Long, Double)].collect().toSet
    val want = probe()
    assert(want.nonEmpty)

    // strip the stats tree → the pre-r15 layout, where the vecs dir's
    // own _SUCCESS was the marker. Probing must throw, not serve an
    // empty result from a populated index (r15 ADVICE).
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete()
    }
    rmrf(new java.io.File(s"${cfg.dir}/stats"))
    val e = intercept[IllegalStateException] { probe() }
    assert(e.getMessage.contains("legacy"), e.getMessage)

    // backfill re-derives the markers from the committed vecs epochs:
    // probes resume bit-identically, and replay stays a no-op
    IncrementalAnnIndex.backfillLegacyMarkers(spark, cfg)
    assert(probe() == want, "backfilled index lost or changed neighbors")
    val vecFiles = java.nio.file.Files
      .walk(java.nio.file.Paths.get(s"${cfg.dir}/vecs"))
      .filter(_.getFileName.toString.endsWith(".parquet")).count()
    IncrementalAnnIndex.ingestBatch(cfg,
      emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", 1L)
    assert(java.nio.file.Files
      .walk(java.nio.file.Paths.get(s"${cfg.dir}/vecs"))
      .filter(_.getFileName.toString.endsWith(".parquet")).count()
      == vecFiles, "replay after backfill must be a no-op")
  }
}
