package graft.operators

import org.apache.spark.sql.DataFrame

/** Transient within-call materialization fence — the
  * [[Clustering.connectedComponents]] / Dedup.fencedOnce pattern,
  * shared: re-root a DataFrame on its computed, persisted InternalRow
  * RDD so that ONE invocation's several consumers (an eager stats
  * collect + the final scoring job) share one computation, with a
  * bounded registry retiring older calls' blocks.
  *
  * Deliberately an RDD persist, NOT `df.persist()`: a DataFrame-level
  * persist registers the plan in the session CacheManager, which
  * SUBSTITUTES the cached blocks into any later query that builds the
  * same canonical plan — i.e. the next bench round's identical call
  * would silently read this round's result instead of recomputing
  * (cross-run result caching, which the bench rules forbid). An RDD
  * persist is invisible to plan matching: every new call re-roots a
  * fresh RDD and recomputes from the source; only the consumers INSIDE
  * one call share. Blocks are evictable MEMORY_AND_DISK with live
  * lineage (the r17 jaccard-fence lesson — never checkpoint-pinned).
  */
private[graft] object Fence {

  private val live = new java.util.ArrayDeque[org.apache.spark.rdd.RDD[_]]()

  def persistedOnce(df: DataFrame, capacity: Int = 8): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val rdd = Bridge.internalRdd(df).map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    live.synchronized {
      live.addLast(rdd)
      while (live.size > capacity)
        live.removeFirst().unpersist(blocking = false)
    }
    Bridge.fromInternalRows(df.sparkSession, rdd, df.schema)
  }
}
