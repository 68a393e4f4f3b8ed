package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantizer, ScalarQuantizer}

/** The SQ-family literal-budget fix (the 1-D analogue of
  * [[CodebookEquivalenceSpec]]): the per-dim min/scale grids ship as
  * single array Literals instead of per-element `array(lit, …)` trees.
  * Pins (a) bit-identity against the per-element form at small dim and
  * (b) that flat SQ and IVF-SQ actually plan and run at dim 1024, where
  * the per-element form's thousands of literal nodes per call site
  * re-enter the Janino plan-time regime — with an explicit node-count
  * bound on the analyzed plan so a regression is a test failure, not a
  * slow bench. */
class SqLiteralFormSpec extends SparkSpec {
  import spark.implicits._

  private def vecsDf(n: Int, dim: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
        (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f).toSeq))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
  }

  test("encode bit-matches the per-element literal form (dim 8)") {
    val df = vecsDf(300, 8, seed = 11)
    val b = ScalarQuantizer.bounds(df, "v", 8)
    val got = ScalarQuantizer.encode(df, "id", "v", b)
    // the r10 form, reconstructed: CreateArray of per-element literals
    val minsLit = array(b.mins.map(lit(_)): _*)
    val invLit = array(b.scales.map(s =>
      lit(if (s == 0.0) 0.0 else 1.0 / s)): _*)
    val old = df.select(col("id"),
      zip_with(
        zip_with(ProductQuantizer.unit(col("v")), minsLit,
          (x, mn) => x.cast("double") - mn),
        invLit,
        (cen, inv) => least(lit(255),
          greatest(lit(0), round(cen * inv).cast("int")))).as("codes"))
    val diff = got.as("a").join(old.as("b"), "id")
      .filter(col("a.codes") =!= col("b.codes"))
    assert(diff.count() == 0)
  }

  private def planNodes(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case p => p.expressions.map(e =>
        e.collect { case _ => 1 }.size).sum
    }.sum

  test("flat SQ plans O(1) in dim and runs at dim 1024") {
    val dim = 1024
    val corpus = vecsDf(60, dim, seed = 3)
    val queries = corpus.filter(col("id") < 2)
    val top = ScalarQuantizer.sqTopK(corpus, queries, "id", "v",
      k = 3, dim = dim)
    // per-element grids would put >4·dim literal nodes in this plan
    assert(planNodes(top) < 2000, s"plan has ${planNodes(top)} nodes")
    val rows = top.orderBy("query_id", "rank").collect()
    assert(rows.length == 6)
    // SQ8 of a unit vector is near-exact: top-1 must match brute force
    val exact = graft.operators.Similarity.bruteForceTopK(
      corpus, queries, "id", "v", k = 1)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toMap
    Seq(0L, 1L).foreach { q =>
      val got1 = rows.filter(r => r.getLong(0) == q).head.getLong(2)
      assert(got1 == exact(q), s"query $q top-1")
    }
  }

  test("IVF-SQ plans O(1) in dim and runs at dim 1024") {
    val dim = 1024
    val corpus = vecsDf(60, dim, seed = 5)
    val queries = corpus.filter(col("id") < 2)
    // nlist 8 × dim 1024 = 8192 elements: past the codebook literal
    // budget, so the coarse quantizer takes its bound form and the ONLY
    // per-dim state left in the plan is the SQ grids — which must be
    // single Literals for the bound to hold
    val top = ScalarQuantizer.ivfSqTopK(corpus, queries, "id", "v",
      k = 3, dim = dim, nlist = 8, nprobe = 8, iters = 1)
    assert(planNodes(top) < 4000, s"plan has ${planNodes(top)} nodes")
    assert(top.orderBy("query_id", "rank").collect().length == 6)
  }
}
