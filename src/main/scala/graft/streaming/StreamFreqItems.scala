package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.expressions.MGSummary

/** Streaming heavy hitters — a Misra–Gries summary maintained as keyed
  * stream state, the continuous counterpart of the `freq_items`
  * aggregate: "top domains/tokens so far" updated every trigger without
  * ever storing per-item counters beyond the sketch capacity.
  *
  * State per key is ONE summary of ≤ capacity counters (the same
  * `MGSummary` the batch aggregate uses, so batch and stream agree on
  * the guarantee: reported counts are lower bounds short by ≤ `err`, and
  * anything with true count > n/(capacity+1) is present). Each trigger
  * emits the key's current top-N with a monotone `n_seen` so consumers
  * (and the spec) can order emissions without wall clocks.
  *
  * Scale: the shuffle is keyed by `key` (stream re-keying only — items
  * never hit the state store individually), state-store traffic is one
  * summary read+write per ACTIVE key per epoch, and capacity bounds the
  * record size. An unbounded-cardinality `groupBy(item).count()` stream
  * would instead grow state with every distinct item forever.
  */
object StreamFreqItems {

  final case class Item(key: String, item: String)

  /** Persisted state: MG counters + total decrement + items seen. */
  final case class MGState(counts: Map[String, Long], decs: Long,
      n_seen: Long)

  final case class TopItem(key: String, item: String, cnt: Long, err: Long,
      n_seen: Long)

  implicit val itemEnc: Encoder[Item] = Encoders.product[Item]
  implicit val stEnc: Encoder[MGState] = Encoders.product[MGState]
  implicit val outEnc: Encoder[TopItem] = Encoders.product[TopItem]
  implicit val strEnc: Encoder[String] = Encoders.STRING

  private[streaming] def update(capacity: Int, topN: Int)(key: String,
      items: Iterator[Item], state: GroupState[MGState]): Iterator[TopItem] = {
    val mg = new MGSummary(capacity)
    var seen = 0L
    state.getOption.foreach { s =>
      s.counts.foreach { case (k, v) => mg.counts.put(k, v) }
      mg.decs = s.decs
      seen = s.n_seen
    }
    items.foreach { it => mg.add(it.item); seen += 1 }
    val counts = {
      val b = Map.newBuilder[String, Long]
      mg.counts.forEach((k, v) => b += k.asInstanceOf[String] -> v)
      b.result()
    }
    state.update(MGState(counts, mg.decs, seen))
    counts.toSeq
      .sortBy { case (item, cnt) => (-cnt, item) }
      .take(topN)
      .map { case (item, cnt) => TopItem(key, item, cnt, mg.decs, seen) }
      .iterator
  }

  /** Per-key running top-N heavy hitters over an item stream. */
  def topItems(items: Dataset[Item], capacity: Int,
      topN: Int): Dataset[TopItem] = {
    require(capacity > 0 && topN > 0, "capacity/topN must be > 0")
    items.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update(capacity, topN))
  }
}
