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
