package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.CdcFixtures
import graft.streaming.StreamPipeline

class StreamFanoutSpec extends SparkSpec {

  test("one stream drives two sinks; epochs commit atomically across both") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fan").toString
    val cdc = CdcFixtures.eventsCdc(spark, sf)
      .withColumn("ts", unix_timestamp(col("ts")))
    cdc.filter(col("event_id") < 500).coalesce(1)
      .write.mode("append").json(s"$tmp/in")
    Thread.sleep(1200)
    cdc.filter(col("event_id") >= 500).coalesce(1)
      .write.mode("append").json(s"$tmp/in")

    val schema = StructType(Seq(
      StructField("op", StringType), StructField("ts", LongType),
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val stream = StreamPipeline.envelopeFileStream(spark, s"$tmp/in",
      schema, maxFilesPerTrigger = 1)

    // sink A: only deletes, as json; sink B: everything, as parquet
    val q = StreamPipeline.fanout(stream, s"$tmp/ckpt", Seq(
      ("deletes",
        (df: org.apache.spark.sql.DataFrame) =>
          df.filter(col("op") === "delete"),
        (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
          df.write.mode("append").json(s"$tmp/a")),
      ("all",
        identity[org.apache.spark.sql.DataFrame] _,
        (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
          df.write.mode("append").parquet(s"$tmp/b"))))
    q.awaitTermination(120000)
    q.stop()

    val total = cdc.count()
    val deletes = cdc.filter(col("op") === "delete").count()
    assert(spark.read.json(s"$tmp/a").count() == deletes)
    assert(spark.read.parquet(s"$tmp/b").count() == total)
  }
}
