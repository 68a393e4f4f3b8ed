package graft

import org.apache.spark.sql.functions._
import graft.operators.Memo

/** The shared artifact memo's contract (extracted r13 from the
  * Similarity/Graphs copies; fingerprint-GUARDED r14): keyed identity
  * with a semanticHash fence on key reuse, None-bypass, segment-boundary
  * prefix invalidation with unpersist. */
class MemoSpec extends SparkSpec {

  test("same key + same plan hits the cache; a different plan under the same key throws") {
    val m = new Memo
    def build() = spark.range(3).toDF("v")
    val a = m(Some("snap1"), "edges")(build())
    val b = m(Some("snap1"), "edges")(build())
    assert(a eq b,
      "key reuse with the same input plan must return the first build")
    // the former footgun, now a loud error: a semantically DIFFERENT
    // input under the SAME key is a stale-snapshot bug, not a cache hit
    val err = intercept[IllegalStateException] {
      m(Some("snap1"), "edges")(spark.range(99).toDF("v"))
    }
    assert(err.getMessage.contains("snap1/edges"))
    // the guard did not evict the good entry
    assert(m(Some("snap1"), "edges")(build()) eq a)
    // different subKey or key builds (and caches) fresh
    val n1 = m(Some("snap1"), "nodes")(build())
    val e2 = m(Some("snap2"), "edges")(build())
    assert(!(n1 eq a) && !(e2 eq a))
    // cacheKey = None bypasses entirely — never caches, never guards
    val d = m(None, "edges")(build())
    val e = m(None, "edges")(spark.range(99).toDF("v"))
    assert(!(d eq e))
  }

  test("fingerprint is semantic, not referential: fresh reads of one source hash equal") {
    val m = new Memo
    val dir = java.nio.file.Files.createTempDirectory("graft-memo").toString
    spark.range(10).toDF("v").write.mode("overwrite").parquet(dir)
    // two independently constructed plans over the same files — the
    // production shape: every probe call re-opens the corpus dir
    val a = m(Some(dir), "scan")(
      spark.read.parquet(dir).filter(col("v") > 2))
    val b = m(Some(dir), "scan")(
      spark.read.parquet(dir).filter(col("v") > 2))
    assert(a eq b, "semantically equal rebuilds must hit, not throw")
  }

  test("invalidate matches key-segment boundaries, unpersists, and rebuilds fresh") {
    val m = new Memo
    val cached = m(Some("/data/corpus1"), "x")(spark.range(4).toDF("v"))
    cached.count()
    assert(cached.storageLevel.useMemory, "memo must persist the artifact")
    val ten = m(Some("/data/corpus10"), "x")(spark.range(5).toDF("v"))
    ten.count()
    m.invalidate("/data/corpus1")
    assert(!cached.storageLevel.useMemory,
      "invalidate must unpersist the evicted artifact")
    assert(ten.storageLevel.useMemory,
      "corpus10 is NOT under the corpus1 prefix — segment boundary (ADVICE)")
    var rebuilt = false
    m(Some("/data/corpus1"), "x") { rebuilt = true; spark.range(4).toDF("v") }
    assert(rebuilt, "evicted key must rebuild")
    // empty prefix is evict-all
    m.invalidate("")
    assert(!ten.storageLevel.useMemory)
  }
}
