package graft

import org.apache.spark.sql.functions._
import graft.core.Envelope
import graft.functions.Transforms
import graft.pipeline.Pipeline
import graft.sources.Connectors._

class PipelineSpec extends SparkSpec {

  test("file-to-file minimum slice (TestFileToFile analogue)") {
    // mirror of pipeline/pipeline_integration_test.go:32-133
    val tmp = java.nio.file.Files.createTempDirectory("graft-p2p").toString
    val in = s"$tmp/in"
    spark.range(10).selectExpr("id AS _id", "concat('doc-', id) AS test")
      .write.mode("overwrite").json(in)
    val sink = new MemorySink
    val p = Pipeline.builder("filecopy")
      .source("src", JsonLinesSource(in, "file.in"))
      .transform("pick", Transforms.pick(Seq("_id", "test")))
      .save("out", sink)
      .build()
    p.run(spark)
    assert(sink.rows.size == 10)
    assert(sink.rows.head.schema.fieldNames.toSeq ==
      Seq("op", "ts", "ns", "_id", "test"))
  }

  test("fan-out: one source, two sinks with independent transform chains") {
    val sinkA = new MemorySink
    val sinkB = new MemorySink
    val p = Pipeline.builder("fanout")
      .source("fixtures", MultiTableSource(sf, Seq("region", "nation")))
      .transform("only-region", identity, ns = "region")
      .save("a", sinkA)
      .transform("rename", Transforms.rename(Map("n_name" -> "name")))
      .save("b", sinkB, ns = "nation")
      .build()
    p.run(spark)
    assert(sinkA.rows.size == 5)   // regions only (transform ns filter)
    assert(sinkB.rows.size == 25)  // nations only (sink ns filter)
    assert(sinkB.rows.head.schema.fieldNames.contains("name"))
  }

  test("describe renders the node tree; build without sinks fails") {
    val d = Pipeline.builder("t")
      .source("s", MultiTableSource(sf, Seq("region")))
      .transform("f", identity)
      .save("k", new MemorySink)
      .build().describe
    assert(d.contains("Source: s") && d.contains("Sink: k") &&
      d.contains("Transform: f"))
    intercept[IllegalArgumentException] {
      Pipeline.builder("empty")
        .source("s", MultiTableSource(sf, Seq("region"))).build()
    }
  }

  test("csv and orc sources round-trip through the envelope") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val df = spark.range(7).selectExpr("id", "concat('n', id) AS name")
    df.write.option("header", "true").csv(s"$tmp/csv")
    df.write.orc(s"$tmp/orc")
    val c = CsvSource(s"$tmp/csv", "csv_ns").read(spark)
    val o = OrcSource(s"$tmp/orc", "orc_ns").read(spark)
    assert(c.count() == 7 && o.count() == 7)
    assert(c.columns.take(3).toSeq == Seq("op", "ts", "ns"))
    assert(o.select("ns").distinct().collect().head.getString(0) == "orc_ns")
  }

  test("resumable TableSource pushes id > last to the scan") {
    val df = TableSource(sf, "orders", Some("o_orderkey"), Some(1400L))
      .read(spark)
    assert(df.filter(col("o_orderkey") <= 1400).count() == 0)
    assert(df.count() > 0)
    // predicate must reach the parquet scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(o_orderkey,1400)"), plan.take(2000))
  }
}
