package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan}
import org.apache.spark.sql.types._
import graft.sources.Connectors
import graft.sources.dsv2.MongoDocsScan

/** Mongo-shaped DSv2 connector (`graft-mongo`): collection listing with
  * `system.*` exclusion (`adaptor/mongodb/reader.go:95-114`),
  * collection_filters server-side predicates (`reader.go:172-181`), the
  * resumable `_id > last` cursor as a plan-visible pushed filter, and the
  * extended-JSON type round-trip. Pushdown asserted at the PLAN level. */
class MongoV2Spec extends SparkSpec {

  /** A database dir: users (mejson-typed), orders, system.indexes (must
    * be excluded from every listing). */
  private lazy val dbDir: String = {
    val db = Files.createTempDirectory("graft-mongo-db").toString
    def writeColl(coll: String, lines: Seq[String]): Unit = {
      Files.createDirectories(Paths.get(db, coll))
      Files.write(Paths.get(db, coll, "part-0.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    writeColl("users", (1 to 20).map { i =>
      s"""{"_id":$i,"name":"user$i","joined":{"$$date":${1700000000000L + i * 86400000L}},"karma":{"$$numberLong":"${10000000000L + i}"},"active":${i % 2 == 0}}"""
    })
    writeColl("orders", (1 to 30).map { i =>
      s"""{"_id":$i,"user_id":${i % 20 + 1},"total":${i * 2.5},"status":"${if (i % 3 == 0) "shipped" else "open"}"}"""
    })
    writeColl("system.indexes", Seq("""{"_id":1,"key":"_id_"}"""))
    db
  }

  private val usersSchema = StructType(Seq(
    StructField("_id", LongType),
    StructField("name", StringType),
    StructField("joined", TimestampType),
    StructField("karma", LongType),
    StructField("active", BooleanType)))

  private val ordersSchema = StructType(Seq(
    StructField("_id", LongType),
    StructField("user_id", LongType),
    StructField("total", DoubleType),
    StructField("status", StringType)))

  private def readUsers: DataFrame =
    spark.read.format("graft-mongo").schema(usersSchema)
      .option("collection", "users").load(dbDir)

  private def scanOf(df: DataFrame): MongoDocsScan = {
    val base = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = base.collect { case b: BatchScanExec => b.scan }
    assert(scans.size == 1, base)
    scans.head.asInstanceOf[MongoDocsScan]
  }

  test("collection listing excludes system.* and honors the ns regex") {
    val all = spark.read.format("graft-mongo")
      .schema(ordersSchema.add("ns", StringType)).load(dbDir)
    val scanned = scanOf(all).scannedCollections
    assert(scanned == Seq("orders", "users"), scanned)
    val onlyU = spark.read.format("graft-mongo")
      .schema(usersSchema).option("ns", "^use").load(dbDir)
    assert(scanOf(onlyU).scannedCollections == Seq("users"))
  }

  test("multi-collection read tags ns; ns equality prunes collections") {
    val schema = StructType(Seq(StructField("_id", LongType),
      StructField("ns", StringType)))
    val df = spark.read.format("graft-mongo").schema(schema).load(dbDir)
    val tags = df.groupBy("ns").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tags == Map("users" -> 20L, "orders" -> 30L), tags)
    val pruned = df.filter(col("ns") === "users")
    val scan = scanOf(pruned)
    assert(scan.scannedCollections == Seq("users"), scan.scannedCollections)
    assert(pruned.count() == 20)
  }

  test("resumable _id > last cursor is a plan-visible pushed filter") {
    val df = readUsers.filter(col("_id") > 15L)
    val pushed: Seq[Filter] = scanOf(df).pushedFilters
    assert(pushed.contains(GreaterThan("_id", 15L)), pushed)
    assert(df.count() == 5)
    assert(df.agg(min("_id")).head.getLong(0) == 16L)
  }

  test("collection_filters evaluate in the scan ($gt ops and equality)") {
    val filters = """{"orders": {"status": "open", "total": {"$gt": 10}}}"""
    val df = spark.read.format("graft-mongo").schema(ordersSchema)
      .option("collection", "orders")
      .option("collection_filters", filters).load(dbDir)
    val expect = spark.read.format("graft-mongo").schema(ordersSchema)
      .option("collection", "orders").load(dbDir)
      .filter(col("status") === "open" && col("total") > 10.0)
    assert(df.count() == expect.count() && df.count() > 0)
    assert(df.exceptAll(expect).count() == 0)
    // malformed filter JSON raises, like the reference's ErrCollectionFilter
    intercept[IllegalArgumentException] {
      spark.read.format("graft-mongo").schema(ordersSchema)
        .option("collection_filters", "not json").load(dbDir).count()
    }
  }

  test("mejson types round-trip: $date -> timestamp, $numberLong -> long") {
    val row = readUsers.filter(col("_id") === 3L).head
    assert(row.getAs[java.sql.Timestamp]("joined").getTime ==
      1700000000000L + 3 * 86400000L)
    assert(row.getAs[Long]("karma") == 10000000003L)
    assert(row.getAs[Boolean]("active") == false)
    // timestamp predicates push down and evaluate correctly
    val cut = new java.sql.Timestamp(1700000000000L + 10 * 86400000L)
    val late = readUsers.filter(col("joined") > lit(cut))
    assert(scanOf(late).pushedFilters.exists {
      case GreaterThan("joined", _) => true
      case _ => false
    }, scanOf(late).pushedFilters)
    assert(late.count() == 10)
  }

  test("column pruning reaches the scan read schema") {
    val df = readUsers.select("name", "karma")
    assert(scanOf(df).readSchema().fieldNames.toSeq == Seq("name", "karma"))
    assert(df.count() == 20)
  }

  test("schema inference recognizes mejson tags") {
    val inferred = spark.read.format("graft-mongo")
      .option("collection", "users").load(dbDir).schema
    val byName = inferred.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("joined") == TimestampType, byName)
    assert(byName("karma") == LongType, byName)
    assert(byName("_id") == LongType && byName("active") == BooleanType)
  }

  test("schema inference samples across docs and collections (union types)") {
    val db = Files.createTempDirectory("graft-mongo-het").toString
    def writeColl(coll: String, lines: Seq[String]): Unit = {
      Files.createDirectories(Paths.get(db, coll))
      Files.write(Paths.get(db, coll, "part-0.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
      ()
    }
    // the NORMAL mongo case: heterogeneous docs — fields missing, null
    // first then concrete, long then double, new fields late in the file
    writeColl("a", Seq(
      """{"_id":1,"n":3,"tag":null}""",
      """{"_id":2,"n":2.5,"tag":"x","extra":{"$date":1700000000000}}"""))
    writeColl("b", Seq("""{"_id":3,"only_b":true}"""))
    val inferred = spark.read.format("graft-mongo").load(db).schema
    val byName = inferred.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("n") == DoubleType, byName)      // long ∪ double widens
    assert(byName("tag") == StringType, byName)    // null defers to later doc
    assert(byName("extra") == TimestampType, byName) // doc-2-only field seen
    assert(byName("only_b") == BooleanType, byName)  // cross-collection field
    // the union schema actually reads every doc (missing fields → null)
    val rows = spark.read.format("graft-mongo").load(db)
    assert(rows.count() == 3)
    assert(rows.filter(col("only_b")).count() == 1)
    // a GENUINE conflict refuses loudly instead of silently mis-typing
    val db2 = Files.createTempDirectory("graft-mongo-conflict").toString
    Files.createDirectories(Paths.get(db2, "c"))
    Files.write(Paths.get(db2, "c", "part-0.jsonl"),
      "{\"_id\":1,\"v\":5}\n{\"_id\":2,\"v\":\"five\"}".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-mongo").load(db2).schema
    }
    assert(e.getMessage.contains("conflicting types") &&
      e.getMessage.contains("'v'"), e.getMessage)
  }

  test("sink writes a collection MongoSource reads back losslessly") {
    val db2 = Files.createTempDirectory("graft-mongo-rt").toString
    val src = graft.core.Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts").as("etime"),
        col("value"))
      .limit(200)
    Connectors.MongoCollectionSink(db2, "events", idCol = "event_id")
      .write(graft.core.Envelope.wrap(src, "events"))
    val backSchema = StructType(Seq(
      StructField("_id", LongType), StructField("user_id", LongType),
      StructField("etime", TimestampType), StructField("value", DoubleType)))
    val back = Connectors.MongoSource(db2, collection = Some("events"),
      schema = Some(backSchema)).read(spark)
    val got = graft.core.Envelope.unwrap(back)
      .withColumnRenamed("_id", "event_id")
    val want = src.withColumn("etime",
      // mejson $date is ms-precision by design
      date_trunc("MILLISECOND", col("etime")))
    assert(got.count() == 200)
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)
  }

  test("a corrupt cell FAILS the scan by default (no silent null column)") {
    val db = Files.createTempDirectory("graft-mongo-corrupt").toString
    Files.createDirectories(Paths.get(db, "events"))
    Files.write(Paths.get(db, "events", "part-0.jsonl"),
      Seq(
        s"""{"_id":1,"etime":{"$$date":1700000000000}}""",
        // the round-8 failure shape: a bare ISO string where the schema
        // says timestamp — must NOT silently null
        s"""{"_id":2,"etime":"2024-01-01T00:00:07.179575"}""")
        .mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("_id", LongType), StructField("etime", TimestampType)))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-mongo").schema(schema).load(db).collect()
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("does not decode"), msg)
    assert(msg.contains("etime"), msg)

    // explicit opt-in restores the permissive null — and counts it
    val lenient = spark.read.format("graft-mongo").schema(schema)
      .option("decode_errors", "null").load(db)
    val rows = lenient.orderBy("_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getTimestamp(1) != null && rows(1).isNullAt(1))
    // the failure count is surfaced as a DSv2 custom metric, and the
    // mode is plan-visible in the scan description
    val scan = lenient.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[MongoDocsScan]
    }.get
    assert(scan.description().contains("DecodeErrors: null(counted)"))
    assert(scan.supportedCustomMetrics().exists(_.name == "decodeFailures"))
    val reader = new graft.sources.dsv2.MongoDocsPartitionReader(
      "events", Paths.get(db, "events", "part-0.jsonl").toString,
      schema, schema, Nil, Array.empty, lenient = true)
    try {
      while (reader.next()) ()
      val m = reader.currentMetricsValues().find(_.name == "decodeFailures")
      assert(m.exists(_.value == 1L), m)
    } finally reader.close()
  }

  test("registry mongodb rows are live") {
    val src = graft.pipeline.Registry.sources("mongodb")(
      Map("uri" -> dbDir, "collection" -> "orders",
        "resume_after" -> 25L))
    val df = src.read(spark)
    assert(df.count() == 5)
    assert(df.columns.contains("op") && df.columns.contains("ns"))
  }
}
