package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.core.Envelope
import graft.operators.Upsert

/** Streaming layer: the reference's CDC tail + idempotent sinks
  * (SURVEY §2.7) as Structured Streaming.
  *
  * Mapping:
  *   - oplog/binlog/logical-decoding tail → `readStream` over an envelope
  *     stream (file-backed here; a Kafka/rate source drops in unchanged)
  *   - commit log + per-sink offset logs   → checkpointLocation (WAL +
  *     commits are exactly the offset bookkeeping of `commitlog/` +
  *     `offset/`, per-query like per-sink offset logs)
  *   - bulk flush every 1000 docs / 2 s    → micro-batch epochs;
  *     `Trigger.ProcessingTime` for cadence, `foreachBatch` for the flush
  *   - at-least-once + upsert-by-id        → `foreachBatch` merge keyed on
  *     id: batch replay converges (idempotent), matching
  *     `adaptor/mongodb/writer.go:53-67`
  *
  * Scale: state here is the TARGET TABLE, not stream state — no unbounded
  * `mapGroupsWithState` buffers. The merge is a shuffle join on the id
  * (broadcast when the epoch is small, the common CDC case). At warehouse
  * scale the read-merge-overwrite becomes a MERGE INTO on a table format
  * with key clustering; the batch algebra (Upsert.applyCdc) is unchanged.
  */
object StreamPipeline {

  /** File-backed envelope stream: JSON-lines files appearing in `dir`,
    * each line an envelope document (op, ts, id, ...). `maxFilesPerTrigger`
    * bounds the epoch, standing in for the reference's bulk-flush count
    * threshold. */
  def envelopeFileStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Parquet-table upsert sink driven by foreachBatch.
    *
    * Each epoch: read current target state, apply the batch's collapsed CDC
    * effect (last-op-per-id; delete removes), atomically swap the target
    * dir. Replaying an epoch after a crash converges to the same state, so
    * checkpoint-restart (at-least-once) is safe — the per-message
    * confirm/offset machinery of `pipeline/node.go:516-594` becomes
    * "epoch committed after foreachBatch returns".
    */
  final class ParquetUpsertSink(spark: SparkSession, targetDir: String,
      idCol: String, baseSchema: StructType) {

    private val fs = java.nio.file.Paths.get(targetDir)
    private val currentPtr = fs.resolve("CURRENT")

    // Versioned-dir + pointer-file commit: state lives in data-v<N>/, and
    // CURRENT names the committed version. The ONLY commit step is an
    // atomic rename of a temp pointer onto CURRENT, so a crash at any
    // point leaves CURRENT naming either the old or the new version —
    // never a half-written table. Stale data-v dirs are removed lazily.
    private def currentVersion(): Long =
      if (java.nio.file.Files.exists(currentPtr))
        java.nio.file.Files.readString(currentPtr).trim.toLong
      else -1L

    def currentState(): DataFrame = {
      val v = currentVersion()
      if (v >= 0)
        spark.read.parquet(fs.resolve(s"data-v$v").toString)
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], baseSchema)
    }

    /** Idempotent epoch application (replaying an epoch re-derives and
      * re-commits the same next-state). */
    def applyBatch(batch: DataFrame, epochId: Long): Unit = {
      val base = currentState()
      val next = Upsert.applyCdc(base, batch, idCol,
        Seq(col(Envelope.TsCol), col("event_id")))
      val prevV = currentVersion()
      val nextV = prevV + 1
      val nextDir = fs.resolve(s"data-v$nextV")
      if (java.nio.file.Files.exists(nextDir)) // leftover from a crash
        org.apache.commons.io.FileUtils.deleteDirectory(nextDir.toFile)
      next.write.mode("overwrite").parquet(nextDir.toString)
      val tmpPtr = fs.resolve(s"CURRENT.tmp-$epochId")
      java.nio.file.Files.writeString(tmpPtr, nextV.toString)
      java.nio.file.Files.move(tmpPtr, currentPtr,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      if (prevV >= 0) // committed; old version is garbage now
        org.apache.commons.io.FileUtils.deleteQuietly(
          fs.resolve(s"data-v$prevV").toFile)
    }

    def start(stream: DataFrame, checkpoint: String,
        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
      stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(trigger)
        .foreachBatch((batch: DataFrame, epochId: Long) =>
          applyBatch(batch, epochId))
        .start()
  }

  /** Streaming fan-out: ONE stream drives N sinks inside a single
    * foreachBatch — the reference's source-broadcast tree
    * (`pipe/pipe.go:158-165`) in micro-batch form. Each sink sees the
    * epoch after its own ns-filter + transform chain; the epoch commits
    * only after EVERY sink write returns, so all sinks share one offset
    * log (at-least-once per sink, exactly like the per-sink offset logs
    * collapsing to the min offset on resume, `pipeline/node.go:269-345`).
    *
    * Idempotent sinks are still required: a crash mid-epoch replays the
    * epoch into ALL sinks, including those that already wrote it.
    */
  def fanout(stream: DataFrame, checkpoint: String,
      sinks: Seq[(String, DataFrame => DataFrame,
        (DataFrame, Long) => Unit)],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // one cached scan of the epoch serves every sink
        batch.persist()
        try sinks.foreach { case (_, transform, write) =>
          write(transform(batch), epochId)
        } finally batch.unpersist()
        ()
      }
      .start()

  /** Windowed streaming aggregation with watermark (beyond the reference's
    * phase markers — the idiomatic home for its flush-cadence semantics). */
  def windowedCounts(stream: DataFrame, tsCol: String, window: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(Envelope.OpCol))
      .agg(count(lit(1)).as("n"))
}
