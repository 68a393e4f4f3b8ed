package graft

import org.apache.spark.sql.functions._
import graft.core.{CdcFixtures, Tables}
import graft.operators.{Compaction, Upsert}

class CompactionUpsertSpec extends SparkSpec {

  test("lastPerKey and lastPerKeyMaxBy agree on unique offsets") {
    val ev = Tables.table(spark, sf, "events")
      .select("user_id", "event_id", "event_type", "value")
    val a = Compaction.lastPerKey(Seq("user_id"), Seq(col("event_id")))(ev)
      .orderBy("user_id").collect()
    val b = Compaction.lastPerKeyMaxBy(Seq("user_id"), "event_id")(ev)
      .orderBy("user_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == ev.select("user_id").distinct().count())
  }

  test("applyCdc: delete removes, noop never masks, last write wins") {
    import spark.implicits._
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "value")
    val batch = Seq(
      // (op, ts, off, id, value)
      ("update", 1L, 1L, 1L, 11.0),
      ("noop",   2L, 2L, 1L, 99.0),  // must NOT mask the update
      ("delete", 1L, 3L, 2L, 0.0),
      ("insert", 1L, 4L, 3L, 30.0),
      ("update", 1L, 5L, 3L, 31.0)   // last write wins
    ).toDF("op", "ts", "off", "id", "value")
    val out = Upsert.applyCdc(base, batch.select("op", "id", "value", "ts", "off"),
        "id", Seq(col("ts"), col("off")))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 11.0), (3L, 31.0)))
  }

  test("applyCdc is idempotent: replaying the batch converges") {
    val cdc = CdcFixtures.eventsCdc(spark, sf)
    val base = cdc.select("user_id", "value").limit(0)
    val once = Upsert.applyCdc(base, cdc, "user_id", Seq(col("ts"), col("event_id")))
    val twice = Upsert.applyCdc(once, cdc, "user_id", Seq(col("ts"), col("event_id")))
    assert(once.orderBy("user_id").collect().toSeq ==
           twice.orderBy("user_id").collect().toSeq)
  }
}
