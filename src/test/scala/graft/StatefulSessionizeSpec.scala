package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.operators.Sessionize
import graft.streaming.StatefulSessionize

class StatefulSessionizeSpec extends SparkSpec {

  test("streaming stateful sessions == batch sessionize (closed sessions)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val ev = Tables.table(spark, sf, "events")
      .select("user_id", "ts", "event_id", "value")

    // real events in two ordered segments, then a far-future sentinel per
    // user that advances the watermark past every real session's gap
    ev.filter(col("event_id") < 500).coalesce(1)
      .write.mode("append").json(s"$tmp/in")
    Thread.sleep(1200)
    ev.filter(col("event_id") >= 500).coalesce(1)
      .write.mode("append").json(s"$tmp/in")
    Thread.sleep(1200)
    ev.select(col("user_id")).distinct()
      .withColumn("ts", lit("2030-01-01 00:00:00").cast("timestamp"))
      .withColumn("event_id", lit(999999L) + col("user_id"))
      .withColumn("value", lit(0.0))
      .coalesce(1).write.mode("append").json(s"$tmp/in")

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("value", DoubleType)))
    import StatefulSessionize._
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(s"$tmp/in")
      .as[Ev](evEnc)
    val q = StatefulSessionize.sessions(stream, gapSeconds = 1800L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    q.awaitTermination(180000)

    val streamed = spark.table("sess_out")
      .filter(col("session_start") < lit("2029-01-01").cast("timestamp"))
      .select("user_id", "session_idx", "n_events")
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val batch = Sessionize.sessionStats(ev, Seq("user_id"), "ts", 1800L,
        "value", Seq("event_id"))
      .select("user_id", "session_idx", "n_events")
      .orderBy("user_id", "session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
