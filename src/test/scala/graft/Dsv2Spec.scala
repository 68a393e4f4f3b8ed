package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, GreaterThan, IsNotNull}
import org.apache.spark.sql.types._
import graft.sources.dsv2.JsonLinesScan

/** DSv2 connector: pushdown asserted at the PLAN level — the
  * BatchScanExec's Scan object is ours and carries the pushed filters —
  * not by string-matching explain output. */
class Dsv2Spec extends SparkSpec {

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2").toString
    graft.core.Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartition(3).write.json(s"$tmp/events")
    s"$tmp/events"
  }

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def readV2: DataFrame =
    spark.read.format("graft-jsonl").schema(schema).load(dir)

  /** The one custom Scan node of a plan (descending through AQE). */
  private def scanOf(df: DataFrame): JsonLinesScan = {
    val base = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = base.collect { case b: BatchScanExec => b.scan }
    assert(scans.size == 1, base)
    scans.head.asInstanceOf[JsonLinesScan]
  }

  test("reads a json-lines dir with one partition per file") {
    val expect = spark.read.schema(schema).json(dir)
    assert(readV2.count() == expect.count())
    assert(readV2.rdd.getNumPartitions == 3)
    assert(readV2.exceptAll(expect).count() == 0)
  }

  test("filter pushdown is plan-visible and evaluated in the scan") {
    val df = readV2.filter(col("event_id") > 600L)
    val scan = scanOf(df)
    val pushed: Seq[Filter] = scan.pushedFilters
    assert(pushed.contains(GreaterThan("event_id", 600L)), pushed)
    assert(pushed.contains(IsNotNull("event_id")), pushed)
    val expect = spark.read.schema(schema).json(dir)
      .filter(col("event_id") > 600L)
    assert(df.count() == expect.count() && df.count() > 0)
  }

  test("unsupported predicates stay residual, supported ones push") {
    val df = readV2.filter(col("event_type").contains("ck") &&
      col("user_id") <= 50L)
    val pushed = scanOf(df).pushedFilters
    assert(pushed.exists {
      case org.apache.spark.sql.sources.LessThanOrEqual("user_id", 50L) => true
      case _ => false
    }, pushed)
    // StringContains is NOT pushable here — Spark must keep the residual
    assert(!pushed.exists(_.toString.contains("Contains")), pushed)
    val expect = spark.read.schema(schema).json(dir)
      .filter(col("event_type").contains("ck") && col("user_id") <= 50L)
    assert(df.exceptAll(expect).count() == 0 &&
      expect.exceptAll(df).count() == 0)
  }

  test("column pruning reaches the scan's read schema") {
    val df = readV2.select("event_id", "value")
    assert(scanOf(df).readSchema().fieldNames.toSeq == Seq("event_id", "value"))
  }

  test("resumable scan = pushed GreaterThan (reference cursor semantics)") {
    val resumed = readV2.filter(col("event_id") > 500L)
      .select("event_id").orderBy("event_id")
    val scan = scanOf(resumed)
    assert(scan.pushedFilters.contains(GreaterThan("event_id", 500L)))
    // pruning composes with pushdown
    assert(scan.readSchema().fieldNames.toSeq == Seq("event_id"))
  }

  test("schema inference from the first line (atomic types)") {
    val inferred = spark.read.format("graft-jsonl").load(dir)
    val byName = inferred.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("event_id") == LongType)
    assert(byName("event_type") == StringType)
    assert(byName("value") == DoubleType)
  }
}
