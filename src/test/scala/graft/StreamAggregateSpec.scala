package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.streaming.StreamAggregate

/** Streaming watermarked window agg == batch window agg over the rows
  * that arrived before the watermark; a too-late row is dropped by
  * contract and is exactly the difference from batch. */
class StreamAggregateSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("etype", StringType),
    StructField("ts", StringType),
    StructField("value", DoubleType)))

  private def writeChunk(dir: String,
      rows: Seq[(Long, String, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "etype", "ts", "value").coalesce(1)
      .write.mode("append").json(dir)
    Thread.sleep(1200)
  }

  test("append-mode window agg matches batch once watermark closes windows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sagg").toString
    val dir = s"$tmp/in"

    // two hours of events across two keys, in two epochs
    val onTime = (0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) "click" else "view",
        f"2024-01-01 ${10 + i / 20}%02d:${(i * 3) % 60}%02d:00", i * 0.5)
    }
    writeChunk(dir, onTime.take(20))
    writeChunk(dir, onTime.drop(20))
    // a LATE row for the first window, arriving after much later events:
    // watermark (10 min) has passed its window end → must be dropped
    writeChunk(dir, Seq((98L, "click", "2024-01-01 10:00:30", 1000.0)))
    // sentinel far in the future: pushes the watermark past every real
    // window so append mode emits them all; its own window stays open
    writeChunk(dir, Seq((99L, "sentinel", "2024-01-02 00:00:00", 0.0)))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val q = StreamAggregate.tumbling(stream, "ts", "etype",
        windowDuration = "30 minutes", watermarkDelay = "10 minutes",
        valueCol = "value")
      .writeStream.format("memory").queryName("sagg_out")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("sagg_out")
      .filter(col("etype") =!= "sentinel")
      .select(col("window_start").cast("string"), col("etype"),
        col("n_events"), col("sum_value").cast("string"))
      .as[(String, String, Long, String)].collect().toSet

    // batch reference over the ON-TIME rows only (late row 98 dropped by
    // watermark contract; including it is exactly how batch differs)
    val batch = onTime.toDF("event_id", "etype", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "30 minutes").as("w"), col("etype"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))
      .select(col("w.start").cast("string"), col("etype"),
        col("n_events"), col("sum_value").cast("string"))
      .as[(String, String, Long, String)].collect().toSet

    assert(got == batch)
    assert(got.nonEmpty)
    // and the late row really was excluded: batch WITH it differs
    val withLate = (onTime :+ (98L, "click", "2024-01-01 10:00:30", 1000.0))
      .toDF("event_id", "etype", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "30 minutes").as("w"), col("etype"))
      .agg(count(lit(1)).as("n_events"))
      .count()
    assert(withLate == batch.size) // same window/key set…
    val lateWindowN = spark.table("sagg_out")
      .filter(col("window_start") === lit("2024-01-01 10:00:00").cast("timestamp")
        && col("etype") === "click")
      .select("n_events").as[Long].head()
    val batchLateN = onTime.toDF("event_id", "etype", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .filter(col("etype") === "click" &&
        col("ts") < lit("2024-01-01 10:30:00").cast("timestamp"))
      .count()
    assert(lateWindowN == batchLateN) // …but the late row's count is absent
  }
}
