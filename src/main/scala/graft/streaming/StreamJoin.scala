package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the streaming counterpart
  * of the batch as-of/range join family: correlate two live streams
  * (impressions ↔ clicks, orders ↔ shipments) where the match must land
  * inside an event-time window of the left row.
  *
  * Spark buffers both sides in state; the WATERMARKS plus the TIME-RANGE
  * join condition are what let it evict — a left row can be dropped once
  * the right watermark passes `leftTs + upper`, so state is bounded by
  * (stream rate × interval + watermark delay), never by stream history.
  * Omitting the range bound (a plain equi-join of streams) would grow
  * state forever; this operator makes the bound part of the signature so
  * the unbounded form is unrepresentable.
  *
  * Inner joins emit matches as they arrive; `leftOuter` additionally
  * emits (left, nulls) once the watermark proves no match can come —
  * the same "closed-window finality" contract as StreamAggregate.
  */
object StreamJoin {

  /** Join rows of `left` and `right` sharing `keyCol` where
    * `rightTs - leftTs` ∈ [lower, upper] (both java.time.Duration-style
    * strings, e.g. "0 seconds", "1 hour"; negative lower allowed).
    * Column name collisions other than `keyCol` must be resolved by the
    * caller (the spec prefixes them). */
  def interval(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, keyCol: String,
      leftWatermark: String, rightWatermark: String,
      lower: String, upper: String,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "leftOuter").contains(joinType),
      s"unsupported stream join type: $joinType")
    val l = left.withWatermark(leftTs, leftWatermark)
    val r = right.withWatermark(rightTs, rightWatermark)
    val cond: Column =
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) + expr(s"INTERVAL $lower") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $upper")
    l.join(r, cond, joinType).drop(r(keyCol))
  }
}
