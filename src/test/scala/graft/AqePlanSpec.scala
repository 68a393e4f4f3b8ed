package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** The 167 plan fingerprints pin AQE-OFF compile-time shapes
  * (PlanFenceSpec); production at 100 TB runs AQE ON, and a runtime
  * re-plan is allowed to demote a broadcast or insert work the
  * compile-time fence never sees. This spec executes the scale-critical
  * slots under AQE and asserts the FINAL adaptive plan keeps the
  * load-bearing properties:
  *
  *   - the carry-aggregate pair slots plan ZERO joins (the r12 fix that
  *     killed the 15-30 GB rerank spill at 100x — a runtime re-plan
  *     cannot be allowed to reintroduce one);
  *   - no slot gains a cartesian product;
  *   - no broadcast demotion: at least as many BroadcastHashJoins and at
  *     most as many SortMergeJoins as the AQE-off fingerprint pins
  *     (AQE promoting SMJ -> BHJ is fine; the reverse is the regression);
  *   - no added shuffle exchanges.
  *
  * Expectations come from the checked-in AQE-off lockfile, so a future
  * INTENDED shape change updates both fences in one regeneration. */
class AqePlanSpec extends SparkSpec {

  /** The slots whose plan shape carries the 100 TB story. */
  private val Slots = Seq(
    "embed_ivf_neardup", "dedup_semantic_kept",   // carry-agg: zero joins
    "embed_ivf_hardneg", "dedup_jaccard_exact",
    "anomaly_zscore", "link_pagerank", "web_link_pipeline",
    "link_anchor_texts", "link_incr_rank")

  // dedup_semantic_kept legitimately keeps ONE broadcast join (kept-ids
  // semi join back to the corpus); only the pair slot is fully join-free
  private val ZeroJoinSlots = Set("embed_ivf_neardup")

  private lazy val lockfile: Map[String, String] = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/resources/plan_fingerprints.json")),
      "UTF-8")
    """"([^"]+)":\s*"([^"]*)"""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  private def lockCount(fp: String, kind: String): Int =
    fp.split('|').collectFirst {
      case kv if kv.startsWith(s"$kind=") => kv.stripPrefix(s"$kind=").toInt
    }.getOrElse(0)

  /** Execute and return every node of the FINAL adaptive plan,
    * descending into materialized query stages and nested adaptive
    * subplans. */
  private def finalNodes(df: DataFrame): Seq[String] = {
    df.collect() // drives THIS QueryExecution's adaptive plan to final
    def walk(p: SparkPlan): Seq[String] = {
      val self = p.getClass.getSimpleName
      val inner = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => Nil
      }
      self +: (inner ++ p.children.flatMap(walk))
    }
    val root = df.queryExecution.executedPlan
    assert(root.isInstanceOf[AdaptiveSparkPlanExec] ||
      root.find(_.isInstanceOf[AdaptiveSparkPlanExec]).isDefined ||
      spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "session is not running AQE — this spec would assert nothing")
    walk(root)
  }

  test("scale-critical slots keep their load-bearing shape under AQE") {
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == "true")
    val failures = Slots.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val nodes = finalNodes(df)
      def n(kind: String) = nodes.count(_ == kind)
      val joins = nodes.filter(_.contains("Join"))
      val fp = lockfile.getOrElse(name,
        sys.error(s"$name missing from plan_fingerprints.json"))
      val errs = Seq.newBuilder[String]
      if (nodes.exists(_.contains("CartesianProduct")))
        errs += s"$name: cartesian product under AQE"
      if (ZeroJoinSlots(name) && joins.nonEmpty)
        errs += s"$name: carry-aggregate slot planned joins under AQE: $joins"
      // NOTE no exchange-count compare: under AQE a reused exchange
      // surfaces as its own ShuffleQueryStage wrapping the shared
      // exchange node, so naive node counts double-count what the
      // AQE-off fingerprint records once via ReusedExchangeExec. The
      // join-strategy guards below are the load-bearing properties.
      val bhjOff = lockCount(fp, "BroadcastHashJoinExec")
      val smjOff = lockCount(fp, "SortMergeJoinExec")
      if (n("BroadcastHashJoinExec") < bhjOff)
        errs += s"$name: broadcast demoted under AQE (" +
          s"${n("BroadcastHashJoinExec")} BHJ vs $bhjOff pinned)"
      if (n("SortMergeJoinExec") > smjOff)
        errs += s"$name: SMJ count grew under AQE (" +
          s"${n("SortMergeJoinExec")} vs $smjOff pinned)"
      errs.result()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
