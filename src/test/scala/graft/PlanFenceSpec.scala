package graft

import graft.tools.PlanFence

/** The plan-regression fence: every gate query's canonical physical-plan
  * fingerprint must match the checked-in lockfile
  * (`src/test/resources/plan_fingerprints.json`). A mismatch means the
  * plan CHANGED — a Spark upgrade, a Catalyst rule change, or a refactor
  * de-pushed a filter / added an exchange / dropped a broadcast. If the
  * change is intended, regenerate with
  * `sbt "runMain graft.tools.PlanFence src/test/resources/plan_fingerprints.json"`
  * and review the diff line by line; if not, you just caught a scale
  * regression before it cost a shuffle at 100 TB.
  */
class PlanFenceSpec extends SparkSpec {

  private def pinned: Map[String, String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/plan_fingerprints.json"), "UTF-8")
    try {
      val re = """"([^"]+)":\s*"([^"]*)"""".r
      re.findAllMatchIn(src.mkString)
        .map(m => m.group(1) -> m.group(2)).toMap
    } finally src.close()
  }

  // built once — constructing all plans runs the (cached) index
  // trainings, a few minutes at sf0.001
  private lazy val actualAll: Seq[(String, String)] =
    PlanFence.all(spark, sf)

  /** Queries whose plan shape depends on which per-JVM memo caches are
    * already warm when the plan is built (the quality-model/tf-idf
    * vector caches fill on first ACTION, not at construction — so a
    * fresh JVM plans the build-side joins while a suite-warmed JVM
    * plans a pure InMemoryTableScan read). For these the lockfile pins
    * the COLD shape and the spec asserts the memo-read invariant
    * instead of exact equality. */
  private val memoVolatile = Set(
    "quality_model_deciles", "curate_model_pipeline")

  test("every gate query's plan fingerprint matches the lockfile") {
    val expected = pinned
    val actual = actualAll.toMap
    val missing = expected.keySet -- actual.keySet
    val unpinned = actual.keySet -- expected.keySet
    val changed = (expected.keySet & actual.keySet).toSeq.sorted
      .filterNot(memoVolatile)
      .filter(k => expected(k) != actual(k))
      .map(k => s"$k:\n  pinned: ${expected(k)}\n  actual: ${actual(k)}")
    // the volatile pair still must read their memo and stay join-sane
    memoVolatile.foreach { k =>
      assert(actual(k).contains("InMemoryTableScanExec"),
        s"$k no longer reads its memoized vectors/model: ${actual(k)}")
    }
    assert(missing.isEmpty,
      s"queries in the lockfile but no longer registered: $missing")
    assert(unpinned.isEmpty,
      s"queries with no pinned fingerprint (regenerate the lockfile): $unpinned")
    assert(changed.isEmpty,
      s"${changed.size} plan fingerprint(s) changed:\n${changed.mkString("\n")}")
  }

  /** The declared exact-baseline slots are quadratic BY DESIGN (they
    * bound the bucketed paths' recall); only they may plan a cartesian. */
  private val quadraticByDesign = Set(
    "embed_neardup_exact", "dedup_jaccard_exact")

  test("no gate query plans a cartesian product or errors at plan time") {
    val bad = actualAll.filter { case (name, fp) =>
      (fp.contains("CartesianProduct") && !quadraticByDesign(name)) ||
        fp.startsWith("ERROR") }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
