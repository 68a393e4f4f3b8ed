package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.CodebookExpressions._
import graft.functions.expressions.CodebookTwoLevel._
import graft.operators.Similarity

/** The two-level (IMI-style) coarse quantizer that the pair-generation
  * paths switch to above [[Similarity.TwoLevelMinLists]] — where the
  * occupancy rule makes flat training/assignment quadratic in corpus
  * size. Pins:
  *  (a) exhaustive two-level routing (probe1 = k1) == the flat
  *      [[CodebookTopN]] scan over the SAME flat list set, on random
  *      float data — the structural-equivalence anchor;
  *  (b) the end-to-end two-level `ivfNearDupPairs` keeps exact planted
  *      duplicates (identical vectors route identically, so recall on
  *      exact dups is total regardless of probe1);
  *  (c) layout independence: the trained quantizer and the pair set are
  *      bit-identical from a 1-partition and a 13-partition corpus
  *      (decimal-mean training + attached-array routing).
  */
class CodebookTwoLevelSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def corpus(n: Int, parts: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(11)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
    // plant exact duplicate pairs: ids (n, n+1, n+2) copy ids (0, 1, 2)
    val planted = (0 until 3).map(i => (n.toLong + i, rows(i)._2.clone()))
    spark.createDataFrame((rows ++ planted))
      .toDF("vec_id", "embedding")
      .repartition(parts)
  }

  test("exhaustive two-level routing (probe1 = k1) == the flat scan " +
      "over the same list set") {
    val rnd = new scala.util.Random(5)
    val k1 = 9
    val k2 = 7
    val l2flat = Array.fill(k1 * k2)(
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    // l1 = per-cell mean of its sub-lists (any routing table works for
    // the equivalence: probing EVERY cell makes level 1 irrelevant)
    val l1 = Array.tabulate(k1) { c =>
      val block = l2flat.slice(c * k2, (c + 1) * k2)
      Array.tabulate(dim)(d => block.map(_(d)).sum / k2)
    }
    val vecs = (0 until 300).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("id", "v")
    val both = vecs.select(
      codebook_topn_2l(col("v").cast("array<float>"), l1, l2flat, k2,
        "dot", 3, k1).as("two"),
      codebook_topn(col("v").cast("array<float>"), l2flat, "dot", 3)
        .as("flat"))
    assert(both.filter(not(col("two") <=> col("flat"))).count() == 0)
  }

  test("two-level ivfNearDupPairs keeps exact planted duplicates and is " +
      "layout-independent") {
    val n = 3000
    // force the two-level path: nlist explicitly above TwoLevelMinLists
    def pairs(parts: Int) =
      Similarity.ivfNearDupPairs(corpus(n, parts), "vec_id", "embedding",
        dim, threshold = 0.999, nlist = 1500, nprobe = 2)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val p1 = pairs(1)
    val p13 = pairs(13)
    assert(p1 == p13, "pair set must not depend on the input layout")
    val expectPlanted = (0 until 3).map(i => (i.toLong, (n + i).toLong))
    expectPlanted.foreach { p =>
      assert(p1.contains(p), s"planted exact duplicate $p not recalled")
    }
  }

  test("two-level training is deterministic across layouts") {
    val (l1a, l2a, k2a) = Similarity.ivfCentroidsTwoLevel(
      corpus(800, 1), "vec_id", "embedding", dim, nlist = 1200, iters = 2)
    val (l1b, l2b, k2b) = Similarity.ivfCentroidsTwoLevel(
      corpus(800, 13), "vec_id", "embedding", dim, nlist = 1200, iters = 2)
    assert(k2a == k2b)
    assert(l1a.map(_.toSeq).toSeq == l1b.map(_.toSeq).toSeq)
    assert(l2a.map(_.toSeq).toSeq == l2b.map(_.toSeq).toSeq)
  }
}
