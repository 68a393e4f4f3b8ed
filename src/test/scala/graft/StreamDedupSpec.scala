package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.operators.Dedup
import graft.streaming.StreamDedup

/** Streaming exact dedup == batch dedup on the same corpus; TTL evicts
  * idle fingerprints so re-occurrences past the horizon are kept again. */
class StreamDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", StringType)))

  private def writeChunk(dir: String, rows: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "ts").coalesce(1)
      .write.mode("append").json(dir)
    Thread.sleep(1200) // distinct mod-times → deterministic file order
  }

  test("streaming first-occurrence dedup == batch exactKept (ordered arrival)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    // 100 docs over 60 distinct texts → 40 duplicates, split in two epochs
    val all = (1L to 100L).map(i => (i, s"document body number ${i % 60}",
      "2024-01-01 00:00:00"))
    writeChunk(s"$tmp/in", all.take(50))
    writeChunk(s"$tmp/in", all.drop(50))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(s"$tmp/in")
    val q = StreamDedup.fromText(stream, "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val decisions = spark.table("sdedup_out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("kept"),
        r.getAs[Long]("keep_id")))
    assert(decisions.length == 100)
    val streamKept = decisions.filter(_._2).map(_._1).toSet

    import spark.implicits._
    val batchKept = Dedup.exactKept(
        all.toDF("doc_id", "text", "ts"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamKept == batchKept)
    assert(streamKept.size == 60)
    // every dropped duplicate points at the id that claimed its text
    decisions.filter(!_._2).foreach { case (_, _, keepId) =>
      assert(streamKept.contains(keepId))
    }
  }

  test("TTL evicts idle fingerprints: re-occurrence past horizon is kept") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup-ttl").toString
    val dir = s"$tmp/in"
    // epoch 1: X at t0. epoch 2: same X 10s later → duplicate (within ttl).
    // epoch 3: filler advancing the watermark far past t0+ttl (and past
    // its OWN eviction horizon for X). epoch 4: X again → state was
    // evicted → kept anew.
    writeChunk(dir, Seq((1L, "recurring text", "2024-01-01 00:00:00")))
    writeChunk(dir, Seq((2L, "recurring text", "2024-01-01 00:00:10")))
    writeChunk(dir, Seq((3L, "filler one", "2024-01-01 06:00:00")))
    writeChunk(dir, Seq((4L, "filler two", "2024-01-01 12:00:00")))
    writeChunk(dir, Seq((5L, "recurring text", "2024-01-01 12:00:05")))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = StreamDedup.fromText(stream, "doc_id", "text", "ts",
        ttlMs = Some(3600L * 1000)) // 1 hour horizon
      .writeStream.format("memory").queryName("sdedup_ttl")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val byId = spark.table("sdedup_ttl").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("kept")).toMap
    assert(byId(1L) == true) // first occurrence
    assert(byId(2L) == false) // dup within the horizon
    assert(byId(5L) == true, byId.toString) // state evicted → kept again
  }
}
