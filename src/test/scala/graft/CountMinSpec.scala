package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.Tables
import graft.functions.expressions.CountMinAggregate
import graft.functions.expressions.CountMinAggregate._

/** Count–Min semantics: one-sided error (est >= true, always), exactness
  * without collisions, additive merge == single pass bit-for-bit, layout
  * independence, and the md5 bucket's agreement with the two-hex-digit
  * extraction the DuckDB oracle uses at width 256. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.table(spark, sf, "events")

  test("bucket at width 256 == hex chars 13-14 of md5(i:key)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (i <- 0 until 4; key <- Seq("0", "17", "abc", "user-42", "", "é")) {
      val hex = md.digest(s"$i:$key".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      md.reset()
      val want = Integer.parseInt(hex.substring(12, 14), 16)
      val got = CountMinAggregate.bucket(i, UTF8String.fromString(key), 256)
      assert(got == want, s"i=$i key=$key")
    }
  }

  test("estimate is one-sided: est >= true count for every observed key") {
    val sk = events.agg(cms_agg(col("user_id"), 4, 64).as("sk"))
    val trueCounts = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    val est = trueCounts.crossJoin(sk)
      .select(col("user_id"), col("n"),
        cms_estimate(col("sk"), col("user_id")).as("est"))
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"),
        s"user ${r.get(0)}: est ${r.get(2)} < true ${r.get(1)}")
    }
  }

  test("exact when width large enough that no observed keys collide") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val sk = df.agg(cms_agg(col("k"), 4, 4096).as("sk"))
    val got = sk.select(
      cms_estimate(col("sk"), lit("a")).as("a"),
      cms_estimate(col("sk"), lit("b")).as("b"),
      cms_estimate(col("sk"), lit("c")).as("c")).head()
    assert(got.getLong(0) == 3 && got.getLong(1) == 2 && got.getLong(2) == 1)
  }

  test("daily merge == single monthly pass, bit-for-bit") {
    val single = events
      .agg(cms_agg(col("user_id"), 4, 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    val merged = events
      .groupBy(col("ts").cast("date").as("day"))
      .agg(cms_agg(col("user_id"), 4, 256).as("sk"))
      .agg(cms_merge_agg(col("sk"), 4, 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(single, merged))
  }

  test("layout-independent: repartition(13) gives the identical sketch") {
    val a = events.agg(cms_agg(col("user_id"), 4, 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    val b = events.repartition(13)
      .agg(cms_agg(col("user_id"), 4, 256).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("error bound: est <= true + 2N/width for every observed key (d=4)") {
    val n = events.count()
    val width = 64
    val sk = events.agg(cms_agg(col("user_id"), 4, width).as("sk"))
    val rows = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .crossJoin(sk)
      .select(col("n"), cms_estimate(col("sk"), col("user_id")).as("est"))
      .collect()
    // the 2N/w bound holds with prob 1-2^-4 per key; on the fixed
    // fixture it must hold for the overwhelming majority — allow <=1%
    val viol = rows.count(r =>
      r.getAs[Long]("est") > r.getAs[Long]("n") + 2 * n / width)
    assert(viol <= math.max(1, rows.length / 100),
      s"$viol of ${rows.length} keys exceed the 2N/w bound")
  }

  test("CMS streams through the generic sketch rollup sink: merged state == batch, bit-for-bit") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cms").toString
    val schema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("day", DateType),
      StructField("sk", BinaryType),
      StructField("n", LongType)))
    val sink = new graft.streaming.SketchRollupSink(
      spark, s"$tmp/t", keyCols = Seq("event_type", "day"), schema,
      numBuckets = 8,
      epochAgg = b => b
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(cms_agg(col("user_id"), 4, 256).as("sk"),
          count(lit(1)).as("n")),
      mergeExprs = Seq(cms_merge_agg(col("sk"), 4, 256).as("sk"),
        sum(col("n")).as("n")))
    val ev = events.select("event_type", "ts", "user_id", "event_id")
    (0 until 3).foreach { e =>
      sink.applyBatch(ev.filter(col("event_id") % 3 === e), e.toLong)
    }
    // CM merge is additive and exact, so unlike KLL the streamed state
    // must equal the one-shot batch sketch BYTE-FOR-BYTE per type
    val streamed = sink.currentState()
      .groupBy("event_type")
      .agg(cms_merge_agg(col("sk"), 4, 256).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val batch = ev.groupBy("event_type")
      .agg(cms_agg(col("user_id"), 4, 256).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (et, sk) =>
      assert(java.util.Arrays.equals(sk, batch(et)), s"type $et diverged")
    }
  }

  test("registry 'sketch-rollup' sink (kind=cms): config-constructed, epochs == batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cmsreg").toString
    val sink = graft.pipeline.Registry.sinks("sketch-rollup")(Map(
      "dir" -> s"$tmp/t", "sketch" -> "cms", "group_col" -> "event_type",
      "ts_col" -> "ts", "value_col" -> "user_id",
      "depth" -> 4, "width" -> 256))
      .asInstanceOf[graft.streaming.SketchRollup.RollupSink]
    val ev = events.select("event_type", "ts", "user_id", "event_id")
    (0 until 2).foreach { e =>
      sink.writeEpoch(ev.filter(col("event_id") % 2 === e), e.toLong)
    }
    val streamed = sink.state(spark)
      .groupBy("event_type")
      .agg(cms_merge_agg(col("sk"), 4, 256).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val batch = ev.groupBy("event_type")
      .agg(cms_agg(col("user_id"), 4, 256).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(streamed.keySet == batch.keySet && streamed.forall {
      case (et, sk) => java.util.Arrays.equals(sk, batch(et)) })
    // replayed epoch is skipped (merge-by-add is not idempotent)
    sink.writeEpoch(ev.filter(col("event_id") % 2 === 0), 0L)
    val after = sink.state(spark)
      .groupBy("event_type")
      .agg(cms_merge_agg(col("sk"), 4, 256).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(after.forall { case (et, sk) =>
      java.util.Arrays.equals(sk, batch(et)) })
  }

  test("merge rejects shape mismatch loudly") {
    val a = Seq("x").toDF("k").agg(cms_agg(col("k"), 4, 64).as("sk"))
    val b = Seq("y").toDF("k").agg(cms_agg(col("k"), 4, 128).as("sk"))
    val ex = intercept[Exception] {
      a.unionByName(b).agg(cms_merge_agg(col("sk"), 4, 64)).head()
    }
    assert(ex.getMessage != null)
  }
}
