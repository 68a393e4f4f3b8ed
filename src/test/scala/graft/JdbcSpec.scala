package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Envelope
import graft.sources.Jdbc

/** Live JDBC connector against embedded Derby — the same DriverManager /
  * metadata / MERGE / Spark-JDBC-relation code paths a deployed
  * postgres/mysql URL exercises (reference: `adaptor/postgres/reader.go`,
  * `writer.go`).
  */
class JdbcSpec extends SparkSpec {

  private val dbName = s"graftjdbc${System.nanoTime()}"
  private val url = s"jdbc:derby:memory:$dbName;create=true"
  // Derby's driver autoloads through DriverManager (JDBC 4); no explicit
  // driver class is needed on either the Spark or the raw-JDBC path.
  private val opts = Map.empty[String, String]

  private lazy val seeded: Unit = {
    val c = DriverManager.getConnection(url)
    val s = c.createStatement()
    s.execute("""CREATE TABLE users (
      user_id BIGINT NOT NULL PRIMARY KEY,
      name VARCHAR(64),
      score DOUBLE,
      active BOOLEAN,
      joined DATE,
      updated TIMESTAMP)""")
    s.execute("""CREATE TABLE orders (
      order_id BIGINT NOT NULL PRIMARY KEY,
      user_id BIGINT,
      total DOUBLE)""")
    (1 to 20).foreach { i =>
      s.execute(f"""INSERT INTO users VALUES ($i, 'user$i', ${i * 1.5},
        ${i % 2 == 0}, DATE('2024-01-${10 + i % 20}'),
        TIMESTAMP('2024-01-01 ${i % 10}%02d:00:00'))""")
    }
    (1 to 30).foreach { i =>
      s.execute(s"INSERT INTO orders VALUES ($i, ${i % 20 + 1}, ${i * 10.0})")
    }
    c.close()
  }

  test("snapshot read: typed columns arrive through the driver (no casify)") {
    seeded
    val df = Jdbc.JdbcTableSource(url, "users", options = opts).read(spark)
    assert(Envelope.isEnveloped(df))
    val doc = Envelope.unwrap(df)
    val byName = doc.schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    assert(byName("user_id") == LongType)
    assert(byName("name") == StringType)
    assert(byName("score") == DoubleType)
    assert(byName("active") == BooleanType)
    assert(byName("joined") == DateType)
    assert(byName("updated") == TimestampType)
    assert(df.count() == 20)
    val r = doc.filter(col("user_id") === 2).collect()(0)
    assert(r.getAs[String]("NAME") == "user2")
    assert(r.getAs[Double]("SCORE") == 3.0)
    assert(r.getAs[Boolean]("ACTIVE"))
  }

  test("multi-table scan lists tables and prunes by ns regex before reading") {
    seeded
    val all = Jdbc.JdbcMultiTableSource(url, ".*", options = opts).read(spark)
    assert(all.select(Envelope.NsCol).distinct().collect()
      .map(_.getString(0)).toSet == Set("users", "orders"))
    assert(all.count() == 50)
    val justUsers = Jdbc.JdbcMultiTableSource(url, "^users$", options = opts)
      .read(spark)
    assert(justUsers.count() == 20)
    intercept[IllegalArgumentException] {
      Jdbc.JdbcMultiTableSource(url, "^nothing$", options = opts).read(spark)
    }
  }

  test("resumable scan: id > last is pushed into the remote JDBC query") {
    seeded
    val resumed = Jdbc.JdbcTableSource(url, "users",
      resumeIdCol = Some("user_id"), resumeAfter = Some(15L), options = opts)
      .read(spark)
    assert(resumed.count() == 5)
    // the filter must reach the JDBC scan node (the database skips the
    // synced prefix — Spark never sees those rows), not run post-scan
    val plan = resumed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").matches("(?s).*GreaterThan\\(USER_ID,15\\).*"),
      plan)
  }

  test("primary-key discovery from connector metadata") {
    seeded
    assert(Jdbc.primaryKeys(url, "USERS", opts) == Seq("USER_ID"))
    assert(Jdbc.primaryKeys(url, "ORDERS", opts) == Seq("ORDER_ID"))
  }

  test("CDC upsert round-trip: merge semantics, PK-discovered, idempotent") {
    seeded
    import spark.implicits._
    // envelope CDC: new key (insert), existing key (update; insert-dup
    // semantics too), delete, and a same-key in-epoch overwrite where the
    // LAST op must win
    val cdc = Seq(
      ("insert", 5L, 100L, "newbie", 1.0),
      ("update", 6L, 100L, "newbie2", 2.0), // same key, later ts → wins
      ("update", 7L, 3L, "renamed", 99.0), // existing row replaced
      ("insert", 8L, 4L, "dupkey", 7.0), // dup of seeded id 4 → update
      ("delete", 9L, 10L, "", 0.0)
    ).toDF("op", "ts", "USER_ID", "NAME", "SCORE")

    val sink = Jdbc.JdbcUpsertSink(url, "USERS", options = opts)
    sink.write(cdc)

    def state(): Map[Long, (String, Double)] = {
      val c = DriverManager.getConnection(url)
      val rs = c.createStatement()
        .executeQuery("SELECT user_id, name, score FROM users")
      val b = Map.newBuilder[Long, (String, Double)]
      while (rs.next()) b += rs.getLong(1) -> (rs.getString(2), rs.getDouble(3))
      c.close()
      b.result()
    }

    val s1 = state()
    assert(s1(100L) == ("newbie2", 2.0)) // last-per-key within the epoch
    assert(s1(3L) == ("renamed", 99.0))
    assert(s1(4L) == ("dupkey", 7.0)) // insert on existing key → update
    assert(!s1.contains(10L)) // deleted
    assert(s1.size == 20) // 20 seeded - 1 deleted + 1 new
    // other columns of merged rows are untouched only for NEW columns we
    // didn't carry — this sink writes the columns the CDC frame carries

    // at-least-once replay: applying the SAME epoch again converges
    sink.write(cdc)
    assert(state() == s1)
  }

  test("streaming CDC tail into the JDBC sink == batch applyCdc end state") {
    seeded
    val c0 = DriverManager.getConnection(url)
    c0.createStatement().execute(
      """CREATE TABLE stream_target (
        |  user_id BIGINT NOT NULL PRIMARY KEY,
        |  value DOUBLE,
        |  event_id BIGINT)""".stripMargin)
    c0.close()

    val tmp = java.nio.file.Files.createTempDirectory("graft-jdbc-stream").toString
    val cdc = graft.core.CdcFixtures.eventsCdc(spark, sf)
      .withColumn("ts", unix_timestamp(col("ts")))
    cdc.filter(col("event_id") < 500).coalesce(1)
      .write.mode("append").json(s"$tmp/in")
    Thread.sleep(1200)
    cdc.filter(col("event_id") >= 500).coalesce(1)
      .write.mode("append").json(s"$tmp/in")

    val envSchema = StructType(Seq(
      StructField("op", StringType), StructField("ts", LongType),
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val sink = Jdbc.JdbcUpsertSink(url, "STREAM_TARGET",
      idCols = Seq("USER_ID"),
      orderCols = Seq("ts", "event_id"), options = opts)
    val stream = spark.readStream.schema(envSchema)
      .option("maxFilesPerTrigger", 1).json(s"$tmp/in")
      .select(col("op"), col("ts"),
        col("event_id").as("EVENT_ID"), col("user_id").as("USER_ID"),
        col("value").as("VALUE"))
    val q = stream.writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the sink's last-per-key MERGE is idempotent — at-least-once
        // epoch replay converges, same contract as the parquet sink
        sink.write(batch)
        ()
      }
      .start()
    q.awaitTermination(120000)

    val c = DriverManager.getConnection(url)
    val rs = c.createStatement()
      .executeQuery("SELECT user_id, value FROM stream_target ORDER BY user_id")
    val got = Iterator.continually(rs)
      .takeWhile(_.next()).map(r => (r.getLong(1), r.getDouble(2))).toSeq
    c.close()

    val expect = graft.operators.Upsert.applyCdc(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("user_id", LongType),
            StructField("value", DoubleType)))),
        cdc, "user_id", Seq(col("ts"), col("event_id")))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("registry: postgres/mysql/jdbc names resolve to the live connector") {
    seeded
    val src = graft.pipeline.Registry.sources("postgres")(Map(
      "uri" -> url, "table" -> "users"))
    assert(src.read(spark).count() == 20)
    val multi = graft.pipeline.Registry.sources("jdbc")(Map(
      "uri" -> url, "ns" -> "^orders$"))
    assert(multi.read(spark).count() == 30)
    import spark.implicits._
    val sink = graft.pipeline.Registry.sinks("mysql")(Map(
      "uri" -> url, "table" -> "ORDERS"))
    sink.write(Seq(("insert", 1L, 999L, 1L, 5.0))
      .toDF("op", "ts", "ORDER_ID", "USER_ID", "TOTAL"))
    val c = DriverManager.getConnection(url)
    val rs = c.createStatement()
      .executeQuery("SELECT total FROM orders WHERE order_id = 999")
    assert(rs.next() && rs.getDouble(1) == 5.0)
    c.close()
  }
}
