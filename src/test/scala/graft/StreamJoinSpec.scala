package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.streaming.StreamJoin

/** Stream-stream interval join == the batch join under the same
  * time-range predicate; left-outer emits null-matches only after the
  * watermark proves finality. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val impSchema = StructType(Seq(
    StructField("ad_id", LongType),
    StructField("imp_ts", StringType),
    StructField("campaign", StringType)))
  private val clkSchema = StructType(Seq(
    StructField("ad_id", LongType),
    StructField("clk_ts", StringType),
    StructField("device", StringType)))

  private def writeJson(dir: String, df: org.apache.spark.sql.DataFrame): Unit = {
    df.coalesce(1).write.mode("append").json(dir)
    Thread.sleep(300)
  }

  test("interval join matches batch; state-evicting bounds; left outer finality") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sjoin").toString
    val impDir = s"$tmp/imp"; val clkDir = s"$tmp/clk"

    // impressions every minute; clicks for even ads 5 minutes later,
    // one click far outside the window, one click for an unknown ad
    val imps = (0 until 30).map { i =>
      (i.toLong, f"2024-01-01 09:$i%02d:00", s"c${i % 3}") }
    val clks = (0 until 30 by 2).map { i =>
      (i.toLong, f"2024-01-01 09:${i + 5}%02d:00", "mobile") } ++
      Seq((1L, "2024-01-01 11:59:00", "late-out-of-window"),
        (999L, "2024-01-01 09:10:00", "unknown-ad"))
    writeJson(impDir, imps.toDF("ad_id", "imp_ts", "campaign"))
    writeJson(clkDir, clks.toDF("ad_id", "clk_ts", "device"))
    // sentinels push both watermarks far forward so every outer row closes
    writeJson(impDir, Seq((9998L, "2024-01-02 00:00:00", "sentinel"))
      .toDF("ad_id", "imp_ts", "campaign"))
    writeJson(clkDir, Seq((9999L, "2024-01-02 00:00:00", "sentinel"))
      .toDF("ad_id", "clk_ts", "device"))

    def stream(dir: String, schema: StructType, tsCol: String) =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(dir).withColumn(tsCol, col(tsCol).cast("timestamp"))

    val joined = StreamJoin.interval(
      stream(impDir, impSchema, "imp_ts"), stream(clkDir, clkSchema, "clk_ts"),
      leftTs = "imp_ts", rightTs = "clk_ts", keyCol = "ad_id",
      leftWatermark = "10 minutes", rightWatermark = "10 minutes",
      lower = "0 seconds", upper = "10 minutes", joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("sjoin_out")
      .filter(col("campaign") =!= "sentinel")
      .select("ad_id", "imp_ts", "campaign", "clk_ts", "device")

    // batch truth over the same rows (sentinels excluded)
    val bImp = imps.toDF("ad_id", "imp_ts", "campaign")
      .withColumn("imp_ts", col("imp_ts").cast("timestamp"))
    val bClk = clks.toDF("ad_id", "clk_ts", "device")
      .withColumn("clk_ts", col("clk_ts").cast("timestamp"))
    val want = bImp.join(bClk,
      bImp("ad_id") === bClk("ad_id") &&
        bClk("clk_ts") >= bImp("imp_ts") &&
        bClk("clk_ts") <= bImp("imp_ts") + expr("INTERVAL 10 minutes"),
      "left_outer")
      .drop(bClk("ad_id"))
      .select("ad_id", "imp_ts", "campaign", "clk_ts", "device")

    assert(got.count() == 30, "every impression appears exactly once")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // even ads matched; odd ads (incl. the out-of-window click's ad) null
    assert(got.filter(col("ad_id") % 2 === 0 && col("device").isNull).count() == 0)
    assert(got.filter(col("ad_id") % 2 === 1 && col("device").isNotNull).count() == 0)
  }
}
