package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions

/** Streaming exact deduplication — the continuous counterpart of
  * `operators.Dedup.exact/exactKept` for an arriving document stream:
  * the FIRST occurrence of each content fingerprint passes through,
  * every later duplicate is dropped, across epochs and restarts.
  *
  * Built on `flatMapGroupsWithState` keyed by the md5 content
  * fingerprint (whitespace-normalized, same as the batch operator):
  *
  *   - state per distinct fingerprint is ONE small record (the id that
  *     claimed it + a duplicate counter) — O(1) per key, no document
  *     bytes in the state store;
  *   - within an epoch, ties resolve by smallest id (matching batch
  *     `exact`'s keep-min-id) before state is consulted, so replaying an
  *     epoch emits the same winner (idempotent under at-least-once);
  *   - an optional event-time TTL (watermark timeout) evicts
  *     fingerprints idle longer than the window — bounding state for
  *     endless streams where "duplicate" only matters within a horizon.
  *
  * Scale: the shuffle is keyed by fingerprint (~16 bytes), identical to
  * the batch operator's groupBy; state store traffic is one record per
  * DISTINCT new fingerprint per epoch.
  */
object StreamDedup {

  final case class Doc(doc_id: Long, fp: String, ts: java.sql.Timestamp)

  final case class SeenState(keep_id: Long, dups: Long)

  final case class Decision(doc_id: Long, fp: String, kept: Boolean,
      keep_id: Long)

  implicit val docEnc: Encoder[Doc] = Encoders.product[Doc]
  implicit val stEnc: Encoder[SeenState] = Encoders.product[SeenState]
  implicit val outEnc: Encoder[Decision] = Encoders.product[Decision]
  implicit val strEnc: Encoder[String] = Encoders.STRING

  private[streaming] def update(ttl: Option[Long])(fp: String,
      docs: Iterator[Doc], state: GroupState[SeenState]): Iterator[Decision] = {
    if (state.hasTimedOut) {
      state.remove() // fingerprint idle past the horizon: forget it
      return Iterator.empty
    }
    // smallest id first — batch keep-min-id semantics within the epoch,
    // and deterministic under epoch replay
    val sorted = docs.toArray.sortBy(d => (d.doc_id))
    if (sorted.isEmpty) return Iterator.empty
    val out = Array.newBuilder[Decision]
    var st = state.getOption
    sorted.foreach { d =>
      st match {
        case None =>
          st = Some(SeenState(d.doc_id, 0L))
          out += Decision(d.doc_id, fp, kept = true, d.doc_id)
        case Some(s) =>
          st = Some(s.copy(dups = s.dups + 1))
          out += Decision(d.doc_id, fp, kept = false, s.keep_id)
      }
    }
    st.foreach { s =>
      state.update(s)
      ttl.foreach { horizonMs =>
        val maxTs = sorted.map(_.ts.getTime).max
        state.setTimeoutTimestamp(maxTs + horizonMs)
      }
    }
    out.result().iterator
  }

  /** Per-document keep/drop decisions for a fingerprinted stream.
    * `ttlMs = None` → state lives forever (global dedup); `Some(ms)` →
    * fingerprints idle past the watermark horizon are evicted (the
    * stream must carry a watermark on `ts`). */
  def decisions(docs: Dataset[Doc],
      ttlMs: Option[Long] = None): Dataset[Decision] = {
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update(ttlMs))
  }

  /** Wire a raw (doc_id, text, ts) stream into fingerprinted decisions,
    * fingerprinting with the SAME whitespace-normalized md5 as the batch
    * operator so batch and stream agree on what "duplicate" means. */
  def fromText(stream: DataFrame, idCol: String, textCol: String,
      tsCol: String, ttlMs: Option[Long] = None): Dataset[Decision] = {
    val ds = stream.select(
      col(idCol).cast("long").as("doc_id"),
      TextFunctions.fingerprintMd5(col(textCol)).as("fp"),
      col(tsCol).cast("timestamp").as("ts"))
    val withWm = ttlMs match {
      case Some(_) => ds.withWatermark("ts", "0 seconds")
      case None => ds
    }
    decisions(withWm.as[Doc], ttlMs)
  }
}
