package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-lifetime memo for ingest-built DataFrame artifacts (IVF list
  * assignments, link-graph edge indexes, …) — ONE implementation of the
  * pattern [[Similarity]] and [[Graphs]] each grew a copy of.
  *
  * == Key contract ==
  *
  * A `cacheKey` names an IMMUTABLE corpus snapshot (by convention the
  * fixture/corpus directory). Reusing a key with a DIFFERENT input
  * DataFrame returns the FIRST build's artifact — the key, not the
  * DataFrame, is the identity. Callers re-keying a changed corpus must
  * use a new key or [[invalidate]] the old one first. `cacheKey = None`
  * disables memoization entirely (the build runs inline, unpersisted).
  *
  * Entries persist at MEMORY_AND_DISK for the session lifetime: these
  * are the multi-TB once-per-corpus artifacts that must never be
  * recomputed per probe call. [[invalidate]] is the explicit eviction
  * hook (unpersists and drops every entry under a key prefix) for
  * long-lived sessions that roll corpus snapshots.
  *
  * Memoization is bit-transparent: persist changes nothing downstream,
  * so every pinned oracle is unaffected by cache state.
  */
private[graft] final class Memo {
  private val cache = new ConcurrentHashMap[String, DataFrame]()

  def apply(cacheKey: Option[String], subKey: String)(
      build: => DataFrame): DataFrame = cacheKey match {
    case Some(key) => cache.computeIfAbsent(s"$key/$subKey", _ =>
      build.persist(StorageLevel.MEMORY_AND_DISK))
    case None => build
  }

  /** Unpersist and drop every entry whose full key starts with
    * `keyPrefix` (pass the `cacheKey` to evict one snapshot's
    * artifacts). Safe on a live session: in-flight plans that already
    * resolved the cached DataFrame recompute from lineage. */
  def invalidate(keyPrefix: String): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(keyPrefix)) {
        e.getValue.unpersist(blocking = false)
        it.remove()
      }
    }
  }
}
