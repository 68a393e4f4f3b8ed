package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Envelope

/** Idempotent upsert semantics of the reference sinks
  * (`adaptor/mongodb/writer.go:19-67`: insert-dup→update, update-replace,
  * delete-by-id; rethink `Conflict:"replace"` `adaptor/rethinkdb/writer.go:86`;
  * ES index-by-id). Delivery is at-least-once, so the sink must be
  * idempotent on the document id — replaying a batch must converge to the
  * same final state (`DESIGN.md` §Message Guarantees).
  *
  * Batch formulation: given a base table and a CDC envelope batch, the new
  * state is
  *   base rows whose id is untouched
  *   ∪ (last op per id from the batch, when that op is not delete)
  * — i.e. a compaction of the batch followed by an outer merge. Both steps
  * are single-shuffle on the id; at scale the merge is a shuffle join on id
  * (or a broadcast join when the batch epoch is small, the common CDC case).
  */
object Upsert {

  /** Collapse a CDC batch to its final per-id effect (last op wins, in
    * `orderCols` order — commit-log offset order in the reference). */
  def collapse(idCol: String, orderCols: Seq[Column])(batch: DataFrame): DataFrame =
    Compaction.lastPerKey(Seq(idCol), orderCols)(batch)

  /** Apply a collapsed CDC batch to a base table. `batch` must carry the
    * envelope `op` column plus the base schema; ops other than delete write
    * the full document (update-as-full-replace —
    * `adaptor/mongodb/reader.go:296-315`).
    */
  def applyCdc(base: DataFrame, batch: DataFrame, idCol: String,
               orderCols: Seq[Column]): DataFrame = {
    // noop/command messages change nothing and must not mask earlier writes,
    // so they are excluded BEFORE collapsing (reference applies ops
    // sequentially; a trailing noop leaves prior state intact).
    val writes = batch.filter(
      col(Envelope.OpCol).isin(Envelope.Op.Insert, Envelope.Op.Update,
        Envelope.Op.Delete))
    val effective = collapse(idCol, orderCols)(writes)
    val survivors = Envelope.unwrap(
      effective.filter(col(Envelope.OpCol) =!= Envelope.Op.Delete))
      .select(base.columns.map(col): _*)
    val untouched = base.join(effective.select(idCol), Seq(idCol), "left_anti")
    untouched.unionByName(survivors)
  }
}
