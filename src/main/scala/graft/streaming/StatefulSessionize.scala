package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-sessionization with custom state — the
  * `flatMapGroupsWithState` counterpart of the batch `operators.Sessionize`
  * (same semantics, verified equal in StatefulSessionizeSpec).
  *
  * State per key = the one OPEN session (+ running session counter): O(1)
  * state per key regardless of stream length — no buffered events. A
  * session emits when a later event overshoots the gap (closed by data) or
  * when the EVENT-TIME timeout fires (closed by watermark) — so output is
  * append-mode and final.
  *
  * Scale: state store traffic is one tiny record per active key per epoch;
  * watermark bounds state lifetime (keys idle past gap+watermark are
  * timed out and evicted).
  */
object StatefulSessionize {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
      value: Double)

  final case class OpenSession(user_id: Long, idx: Long, start: Timestamp,
      end: Timestamp, n: Long, sum: Double)

  final case class Session(user_id: Long, session_idx: Long,
      session_start: Timestamp, session_end: Timestamp, n_events: Long,
      value_sum: Double)

  implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
  implicit val openEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
  implicit val sessEnc: Encoder[Session] = Encoders.product[Session]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  private def close(s: OpenSession): Session =
    Session(s.user_id, s.idx, s.start, s.end, s.n, s.sum)

  /** Microsecond timestamp (Timestamp.getTime is ms-truncated; the batch
    * operator compares µs, so the streaming side must too). */
  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L

  // A tombstone (n == 0) keeps the per-user session COUNTER after a
  // timeout closes the open session — without it the next session for
  // that user would restart at idx 0, colliding with an already-emitted
  // session. Cost: O(1) state per key that has ever been seen (the price
  // of batch-equal monotone indices).
  private def isTombstone(s: OpenSession): Boolean = s.n == 0L

  def update(gapSeconds: Long)(user: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val gapMicros = gapSeconds * 1000000L
    if (state.hasTimedOut) {
      // watermark passed end+gap: the open session is final
      val s = state.get
      state.update(OpenSession(user, s.idx + 1, s.start, s.end, 0L, 0.0))
      return Iterator(close(s))
    }
    val sorted = events.toArray.sortBy(e => (micros(e.ts), e.event_id))
    var closed = List.empty[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case None =>
          cur = Some(OpenSession(user, 0L, e.ts, e.ts, 1L, e.value))
        case Some(s) if isTombstone(s) =>
          cur = Some(OpenSession(user, s.idx, e.ts, e.ts, 1L, e.value))
        case Some(s) if micros(e.ts) - micros(s.end) <= gapMicros =>
          // min/max, not overwrite: a late-but-in-gap event must not
          // regress the session bounds (or the re-armed timeout)
          val start = if (micros(e.ts) < micros(s.start)) e.ts else s.start
          val end = if (micros(e.ts) > micros(s.end)) e.ts else s.end
          cur = Some(s.copy(start = start, end = end,
            n = s.n + 1, sum = s.sum + e.value))
        case Some(s) =>
          closed ::= close(s)
          cur = Some(OpenSession(user, s.idx + 1, e.ts, e.ts, 1L, e.value))
      }
    }
    cur.foreach { s =>
      state.update(s)
      if (!isTombstone(s)) {
        // ceil the session end to ms: getTime truncates sub-ms micros, so
        // the timeout could fire ~1ms before the microsecond gap boundary
        // and close a session a boundary event (diff == gapMicros) would
        // still extend
        val endMsCeil = (micros(s.end) + 999L) / 1000L
        state.setTimeoutTimestamp(endMsCeil + gapSeconds * 1000L)
      }
    }
    closed.reverse.iterator
  }

  /** Wire the stateful op onto a stream of events (must carry a watermark
    * on `ts` for the event-time timeout to fire). */
  def sessions(events: Dataset[Ev], gapSeconds: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Session] =
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update(gapSeconds))
}
