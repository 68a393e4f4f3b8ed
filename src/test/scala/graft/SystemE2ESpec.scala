package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._

import graft.core.Envelope
import graft.pipeline.ConfigLoader
import graft.sources.Connectors

/** End-to-end SYSTEM test at bench scale (sf0.1, 5000 documents), the
  * engine's analogue of the reference's Enron integration gate
  * (`integration_tests/mongo_to_mongo/transporter_test.go:17-25`: run a
  * whole config-driven pipeline, then assert the sink row count): ONE
  * ConfigLoader JSON drives mongo-dir source → transform chains → an
  * elasticsearch `_bulk` sink (live HTTP) AND a parquet sink, and the
  * outputs are checked by row count AND content hash against
  * independently computed expectations. Every piece exists and is
  * unit-tested elsewhere; this is the only place they run as one
  * config-driven pipeline at bench scale. */
class SystemE2ESpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  /** Minimal ok-mode `_bulk` endpoint: counts actions, acks everything. */
  private class BulkCounter {
    val bodies = new CopyOnWriteArrayList[String]()
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        bodies.add(body)
        val n = body.linesIterator.count(l =>
          l.startsWith("{\"index\"") || l.startsWith("{\"update\"") ||
            l.startsWith("{\"delete\""))
        val items = (0 until n)
          .map(_ => """{"index":{"_id":"x","status":201}}""")
          .mkString("[", ",", "]")
        val resp = s"""{"took":1,"errors":false,"items":$items}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.setExecutor(null)
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def indexActions: Int = {
      import scala.jdk.CollectionConverters._
      bodies.asScala.map(_.linesIterator.count(_.startsWith("{\"index\"")))
        .sum
    }
  }

  test("config-driven pipeline at sf0.1: mongo dir -> transforms -> ES + parquet") {
    assume(new java.io.File(s"$sf01/documents.parquet").exists(),
      "sf0.1 testdata not present")
    val work = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val db = s"$work/db"
    val out = s"$work/out"

    // stage the documents table as a mongo-style collection dir (the
    // extended-JSON format MongoSource scans)
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    Connectors.MongoCollectionSink(db, "documents", idCol = "doc_id")
      .write(Envelope.wrap(docs, "documents"))

    val es = new BulkCounter
    try {
      val cfg = s"""
        |{"name": "e2e-docs",
        | "source": {"adaptor": "mongodb", "uri": "$${DB}",
        |            "collection": "documents"},
        | "sinks": [
        |   {"adaptor": "parquet", "uri": "$${OUT}",
        |    "transforms": [
        |      {"fn": "skip", "field": "lang", "operator": "==",
        |       "match": "en"},
        |      {"fn": "rename", "field_map": {"text": "body"}},
        |      {"fn": "pick", "fields": ["_id", "body", "lang"]}
        |    ]},
        |   {"adaptor": "elasticsearch", "uri": "$${ES}", "index": "docs",
        |    "id_col": "_id", "bulk_actions": 500}
        | ]}""".stripMargin
      val spec = ConfigLoader.parse(cfg,
        Map("DB" -> db, "OUT" -> out, "ES" -> es.url))
      spec.run(spark)

      // independently computed expectations straight from the parquet
      // fixture (the Enron-count pattern, plus a content hash)
      val expected = docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("text"))
      val expectedCount = expected.count()
      val expectedHash = expected
        .agg(expr("bit_xor(xxhash64(doc_id, text))")).head.getLong(0)

      val got = spark.read.parquet(out)
      assert(got.count() == expectedCount)
      // the transform chain renamed text -> body and picked 3 doc columns.
      // The envelope (op/ts/ns) rides alongside, and the command-bypass
      // union (schemaless parity, Pipeline.compileSink) carries the
      // pre-transform columns as ALL-NULL slots — assert they are empty,
      // i.e. the transforms really applied to every non-command row
      assert(Set("op", "ts", "ns", "_id", "body", "lang")
        .subsetOf(got.columns.toSet), got.columns.toSeq)
      for (c <- Seq("text", "source", "n_chars")
           if got.columns.contains(c))
        assert(got.filter(col(c).isNotNull).count() == 0,
          s"column $c should be an all-null bypass slot")
      val gotHash = got
        .agg(expr("bit_xor(xxhash64(_id, body))")).head.getLong(0)
      assert(gotHash == expectedHash, "parquet content hash mismatch")
      // the ES sink (no transform chain) indexed EVERY document once
      assert(es.indexActions == 5000, s"es indexed ${es.indexActions}")
    } finally es.stop()
  }
}
