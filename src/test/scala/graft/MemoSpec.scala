package graft

import org.apache.spark.sql.functions._
import graft.operators.Memo

/** The shared artifact memo's contract (extracted r13 from the
  * Similarity/Graphs copies): keyed identity, None-bypass, prefix
  * invalidation with unpersist. */
class MemoSpec extends SparkSpec {

  test("computeIfAbsent semantics: same key returns the FIRST build; None never caches") {
    val m = new Memo
    var builds = 0
    def build() = { builds += 1; spark.range(3).toDF("v") }
    val a = m(Some("snap1"), "edges")(build())
    val b = m(Some("snap1"), "edges")(build())
    assert(builds == 1 && (a eq b),
      "key reuse must return the first build without rebuilding")
    // the documented footgun: a DIFFERENT input under the SAME key is
    // ignored — the key, not the DataFrame, is the identity
    val c = m(Some("snap1"), "edges") {
      builds += 1; spark.range(99).toDF("v")
    }
    assert(builds == 1 && (c eq a))
    // different subKey or key builds fresh
    m(Some("snap1"), "nodes")(build())
    m(Some("snap2"), "edges")(build())
    assert(builds == 3)
    // cacheKey = None bypasses entirely
    val d = m(None, "edges")(build())
    val e = m(None, "edges")(build())
    assert(builds == 5 && !(d eq e))
  }

  test("invalidate unpersists and drops by key prefix; rebuild is fresh") {
    val m = new Memo
    val cached = m(Some("corpusA"), "x")(spark.range(4).toDF("v"))
    cached.count()
    assert(cached.storageLevel.useMemory, "memo must persist the artifact")
    m(Some("corpusB"), "x")(spark.range(5).toDF("v"))
    m.invalidate("corpusA")
    assert(!cached.storageLevel.useMemory,
      "invalidate must unpersist the evicted artifact")
    var rebuilt = false
    m(Some("corpusA"), "x") { rebuilt = true; spark.range(4).toDF("v") }
    assert(rebuilt, "evicted key must rebuild")
    var rebuiltB = false
    m(Some("corpusB"), "x") { rebuiltB = true; spark.range(5).toDF("v") }
    assert(!rebuiltB, "prefix invalidation must not touch other keys")
  }
}
