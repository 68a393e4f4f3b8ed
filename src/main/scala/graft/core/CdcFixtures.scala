package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CDC envelope derived from the `events` fixture table.
  *
  * The environment has no live databases, so the oplog/binlog/logical-decoding
  * tailers of the reference (`adaptor/mongodb/reader.go:216-294`,
  * `adaptor/mysql/tailer.go:41-400`, `adaptor/postgres/tailer.go:35-137`) are
  * modeled by their OUTPUT CONTRACT: a stream of (op, ts, id, doc) envelopes.
  * `events` plays that role via a fixed event_type → op mapping.
  */
object CdcFixtures {

  /** event_type → op mapping (deterministic, SQL-expressible). */
  val opMapSql: String =
    """CASE event_type
      |  WHEN 'signup' THEN 'insert'
      |  WHEN 'purchase' THEN 'update'
      |  WHEN 'click' THEN 'update'
      |  WHEN 'view' THEN 'noop'
      |  WHEN 'error' THEN 'delete'
      |END""".stripMargin

  /** events → CDC envelope: (op, ts, event_id, user_id, value).
    * `event_id` is the commit-log offset analogue (monotone, unique —
    * `commitlog/commitlog.go:168-183`); `user_id` is the document id.
    */
  def eventsCdc(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events").select(
      expr(opMapSql).as(Envelope.OpCol),
      col("ts"),
      col("event_id"),
      col("user_id"),
      col("value"))
}
