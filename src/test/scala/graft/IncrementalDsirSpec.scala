package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Dsir
import graft.streaming.IncrementalDsirGate

/** Incremental DSIR gate == batch Dsir over the union of ingested
  * epochs; epochs are idempotent; scoring state is dim-bounded. */
class IncrementalDsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.table(spark, sf, "documents")
    .select("doc_id", "text")

  private def target = docs
    .filter(TextFunctions.qualityStats(col("text"))(4) >= 0.06)

  test("three epochs == batch importance weights, replay idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    val cfg = IncrementalDsirGate.Config(s"$tmp/gate", dim = 64)
    IncrementalDsirGate.initTarget(cfg, target, "doc_id", "text")

    val all = docs.as[(Long, String)].collect().toSeq
    val epochs = all.grouped((all.size + 2) / 3).toSeq
    epochs.zipWithIndex.foreach { case (rows, i) =>
      IncrementalDsirGate.ingestBatch(cfg,
        rows.toDF("doc_id", "text"), "doc_id", "text", i.toLong)
    }
    // replay epoch 1 — marker makes it a no-op
    IncrementalDsirGate.ingestBatch(cfg,
      epochs(1).toDF("doc_id", "text"), "doc_id", "text", 1L)

    val inc = IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Dsir.importanceWeights(docs, target, "doc_id", "text",
      dim = 64).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == batch,
      s"diff=${(inc.toSet diff batch.toSet).take(3)}")
  }

  test("half-written epoch: invisible to scoring, replay not skipped") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsir3").toString
    val cfg = IncrementalDsirGate.Config(s"$tmp/gate", dim = 64)
    IncrementalDsirGate.initTarget(cfg, target, "doc_id", "text")
    IncrementalDsirGate.ingestBatch(cfg, docs.limit(100), "doc_id", "text", 0L)
    val before = IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // simulate a crash mid-epoch-1: task files exist, no _SUCCESS
    val half = new java.io.File(s"${cfg.dir}/counts/epoch=1")
    assert(half.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(half.getPath, "part-00000.parquet"),
      Array[Byte](1, 2, 3))
    val after = IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "uncommitted epoch leaked into scoring")
    // the retry is NOT skipped — epoch 1 lands whole and changes state
    IncrementalDsirGate.ingestBatch(cfg,
      docs.filter(col("doc_id") >= 100), "doc_id", "text", 1L)
    val retried = IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(retried != before, "retry of the half-written epoch was skipped")
  }

  test("compact+gc is score-invisible; count files collapse; later epochs compose (r16: dsir joins the GenStore family)") {
    val all = docs.as[(Long, String)].collect().toSeq
    val epochs = all.grouped((all.size + 3) / 4).toSeq

    def gateScores(dir: String, maintainAfter: Int): Map[Long, Long] = {
      val cfg = IncrementalDsirGate.Config(s"$dir/gate", dim = 64)
      IncrementalDsirGate.initTarget(cfg, target, "doc_id", "text")
      epochs.zipWithIndex.foreach { case (rows, i) =>
        IncrementalDsirGate.ingestBatch(cfg,
          rows.toDF("doc_id", "text"), "doc_id", "text", i.toLong)
        if (i == maintainAfter) {
          assert(IncrementalDsirGate.compact(spark, cfg).isDefined)
          IncrementalDsirGate.gc(spark, cfg, graceMs = 0L)
        }
      }
      IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }

    val tmpA = java.nio.file.Files.createTempDirectory("graft-dsc-a").toString
    val tmpB = java.nio.file.Files.createTempDirectory("graft-dsc-b").toString
    val plain = gateScores(tmpA, maintainAfter = -1)
    // compact+gc after epoch 2: epoch 3 lands beside the generation,
    // and the scores still equal the uncompacted gate AND batch Dsir
    val folded = gateScores(tmpB, maintainAfter = 2)
    assert(folded == plain, "compaction changed dsir scores")
    val batch = Dsir.importanceWeights(docs, target, "doc_id", "text",
      dim = 64).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded == batch)

    def countFiles(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) 0L
      else java.nio.file.Files.walk(root)
        .filter(_.getFileName.toString.endsWith(".parquet")).count()
    }
    // the generation is ONE file; only the post-fold epoch remains in
    // the epoch tree (folded count files were gc'd)
    assert(countFiles(s"$tmpB/gate/counts-compact") == 1L)
    assert(countFiles(s"$tmpB/gate/counts") == 1L,
      "gc must strip folded epoch count files")

    // replay of a folded epoch is a no-op (stats markers survive gc)
    val cfgB = IncrementalDsirGate.Config(s"$tmpB/gate", dim = 64)
    IncrementalDsirGate.ingestBatch(cfgB,
      epochs(1).toDF("doc_id", "text"), "doc_id", "text", 1L)
    assert(countFiles(s"$tmpB/gate/counts") == 1L,
      "replay after gc must not re-land folded counts")
  }

  test("pre-stats legacy layout fails loudly; backfill upgrades in place") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsleg").toString
    val cfg = IncrementalDsirGate.Config(s"$tmp/gate", dim = 64)
    IncrementalDsirGate.initTarget(cfg, target, "doc_id", "text")
    // the pre-r16 layout: flat counts under epoch=N, the write's own
    // _SUCCESS as the marker, no stats tree
    Dsir.hashedCounts(docs, "doc_id", "text", 64)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${cfg.dir}/counts/epoch=0")
    val e = intercept[IllegalStateException] {
      IncrementalDsirGate.score(cfg, docs, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("legacy"), e.getMessage)

    IncrementalDsirGate.backfillLegacyMarkers(spark, cfg)
    val inc = IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Dsir.importanceWeights(docs, target, "doc_id", "text",
      dim = 64).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == batch, "backfilled gate diverged from batch Dsir")
    // the upgraded epoch now folds through the family compaction, and
    // scores are unchanged across the fold
    assert(IncrementalDsirGate.compact(spark, cfg).exists(_.gen == 0L))
    IncrementalDsirGate.gc(spark, cfg, graceMs = 0L)
    val after = IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == batch)
  }

  test("backfill re-run recovers an epoch stranded mid-upgrade (crash window)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsrec").toString
    val cfg = IncrementalDsirGate.Config(s"$tmp/gate", dim = 64)
    IncrementalDsirGate.initTarget(cfg, target, "doc_id", "text")
    // legacy flat epoch...
    val flat = Dsir.hashedCounts(docs, "doc_id", "text", 64)
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    flat.coalesce(1).write.mode("overwrite")
      .parquet(s"${cfg.dir}/counts/epoch=0")
    // ...whose upgrade CRASHED between deleting counts/epoch=0 and
    // renaming the rewritten tmp into place: the epoch's only copy
    // lives under counts-upgrade/ (r16 ADVICE — a re-run used to skip
    // the epoch and the final cleanup deleted the surviving data,
    // silently zeroing it out of every future score)
    flat.withColumn("b_mod", lit(0L)).repartition(1)
      .write.mode("overwrite").partitionBy("b_mod")
      .parquet(s"${cfg.dir}/counts-upgrade/epoch=0")
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete()
    }
    rmrf(new java.io.File(s"${cfg.dir}/counts/epoch=0"))

    IncrementalDsirGate.backfillLegacyMarkers(spark, cfg)
    val inc = IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Dsir.importanceWeights(docs, target, "doc_id", "text",
      dim = 64).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == batch,
      "recovered gate diverged from batch Dsir — the stranded epoch was lost")
    assert(!new java.io.File(s"${cfg.dir}/counts-upgrade").exists(),
      "upgrade staging dir must be cleaned up after recovery")
  }

  test("registry drive: dsir-gate sink folds a batch as epoch 0") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsir2").toString
    val cfg = IncrementalDsirGate.Config(s"$tmp/gate", dim = 64)
    IncrementalDsirGate.initTarget(cfg, target, "doc_id", "text")
    val sink = graft.pipeline.Registry.sinks("dsir-gate")(
      Map("dir" -> cfg.dir, "dim" -> 64))
    sink.write(docs)
    val inc = IncrementalDsirGate.score(cfg, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Dsir.importanceWeights(docs, target, "doc_id", "text",
      dim = 64).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == batch)
  }
}
