package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Mean normalized (max-min) width of `c` across the files of `dir` —
    * the proxy for row-group pruning power (smaller = more skippable). */
  private def meanWidth(dir: String, c: String, lo: Double, hi: Double): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    val widths = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
      (r.getDouble(1) - r.getDouble(0)) / (hi - lo)
    }
    widths.sum / widths.length
  }

  test("zorderValue interleaves deterministically and monotonically on the grid") {
    val df = Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
      .toDF("a", "b")
    val z = df.select(Layout.zorderValue(
      Seq(col("a"), col("b")), Seq(0.0, 0.0), Seq(65535.0, 65535.0)).as("z"))
      .as[Long].collect()
    assert(z(0) == 0L)
    assert(z(1) == (1L << 32) - 1) // all 32 bits set
    // a occupies even bits, b odd bits
    assert(z(2) == 0x55555555L)
    assert(z(3) == 0xAAAAAAAAL)
    // nulls and degenerate bounds don't throw
    val zn = Seq((Option.empty[Long], 5L)).toDF("a", "b")
      .select(Layout.zorderValue(Seq(col("a"), col("b")),
        Seq(0.0, 5.0), Seq(10.0, 5.0)).as("z")).as[Long].collect()
    assert(zn(0) == 0L)
  }

  test("z-order write: both columns prunable; linear sort only one") {
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "value")
    val n = events.count()
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString

    Layout.zorderWrite(events, Seq("user_id", "event_id"), zDir, numFiles = 16)
    // baseline: single-column sort layout, same file count
    events.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linDir)

    assert(spark.read.parquet(zDir).count() == n)
    val b = events.agg(
      min("user_id"), max("user_id"), min("event_id"), max("event_id")).head()
    val (uLo, uHi) = (b.getLong(0).toDouble, b.getLong(1).toDouble)
    val (eLo, eHi) = (b.getLong(2).toDouble, b.getLong(3).toDouble)

    val zU = meanWidth(zDir, "user_id", uLo, uHi)
    val zE = meanWidth(zDir, "event_id", eLo, eHi)
    val linU = meanWidth(linDir, "user_id", uLo, uHi)
    val linE = meanWidth(linDir, "event_id", eLo, eHi)

    // linear layout: first column tight, second column useless (~full span)
    assert(linU < 0.2, s"linear user_id width $linU")
    assert(linE > 0.8, s"linear event_id width $linE")
    // z-order: BOTH columns substantially tighter than the linear layout's
    // second column
    assert(zU < 0.6, s"zorder user_id width $zU")
    assert(zE < 0.6, s"zorder event_id width $zE")
    assert(zU + zE < linU + linE, "z-order should beat linear overall")
  }
}
