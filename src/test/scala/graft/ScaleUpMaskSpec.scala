package graft

import org.apache.spark.sql.functions._
import graft.tools.ScaleUp

/** Pins the ScaleUp embeddings-replica invariants behind the ≥100×
  * scale rungs (/tmp/sf10 is factor 100 > dim 64, so replicas past one
  * full rotation turn exist and the ±1 sign mask is load-bearing):
  *
  *   1. No two replicas ever produce the same vector. Without the mask,
  *      replica i ≥ dim is the SAME rotation as replica i−dim and every
  *      one of its vectors aliases bit-for-bit — planting exact
  *      cross-replica duplicates that would corrupt every dedup/ANN
  *      scale ratio (the dedup slots would find factor·n/dim fake dups,
  *      the ANN slots fake neighbors at distance 0).
  *   2. Within a replica, every pairwise dot product equals replica 0's
  *      EXACTLY (not approximately): rotation permutes the aligned
  *      component pairs and the common mask contributes m_j² = 1, and
  *      both are exact in IEEE float (sign flip touches only the sign
  *      bit). This is what makes each replica workload-isomorphic to
  *      the original — near-dup structure and kNN ranks replicate
  *      instead of drifting with the rung.
  *   3. Replicas below one turn (i < dim) are pure rotations,
  *      bit-identical to the pre-mask ScaleUp — so sf1/sf3 dirs
  *      (factors 10/30 < 64) regenerate unchanged and their committed
  *      BENCH numbers stay comparable.
  */
class ScaleUpMaskSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4
  private val factor = 10 // > dim → replicas 4..9 exercise mask turns 1, 2

  // small dense corpus, no planted structure needed
  private val base = {
    val vecs = Seq(
      Array(0.5f, -1.25f, 2.0f, 0.75f),
      Array(-0.125f, 3.0f, 1.5f, -2.25f),
      Array(1.0f, 0.25f, -0.5f, 4.0f),
      Array(2.5f, -0.75f, 0.375f, 1.125f))
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
  }

  private def replica(i: Int) =
    ScaleUp.embedReplica(i, dim, span = 100L)(base)

  private def vectors(i: Int): Seq[Seq[Float]] =
    replica(i).orderBy("vec_id")
      .select("embedding").as[Seq[Float]].collect().toSeq

  // exact pairwise dot products of a replica, in vec_id order
  private def dots(i: Int): Seq[Float] = {
    val vs = vectors(i)
    for {
      a <- vs.indices; b <- vs.indices if a < b
    } yield vs(a).zip(vs(b)).map { case (x, y) => x * y }.sum
  }

  test("no vector aliases across any pair of replicas (mask invariant 1)") {
    val all = (0 until factor).flatMap(vectors)
    assert(all.distinct.size === all.size,
      "replicas past one rotation turn must not alias earlier replicas")
  }

  test("mask leaves within-replica dot products bit-exact (invariant 2)") {
    // The exactness claim is mask-vs-same-rotation: replica i (turn ≥ 1)
    // has the SAME componentwise products in the SAME summation order as
    // the pure rotation i % dim (m_j·a_j · m_j·b_j = a_j·b_j exactly in
    // IEEE float — a sign flip touches only the sign bit). Holds for ANY
    // float values, unlike cross-rotation comparisons, where reordered
    // summation can differ in the last ulp.
    for (i <- dim until factor)
      assert(dots(i) === dots(i % dim),
        s"mask changed replica $i's dot products vs rotation ${i % dim}")
    // On this dyadic fixture (exact products and sums), rotations too
    // match replica 0 exactly — the workload-isomorphism across ALL
    // replicas, checkable bit-exactly here because nothing rounds.
    val d0 = dots(0)
    for (i <- 1 until factor)
      assert(dots(i) === d0, s"replica $i dot products drifted")
  }

  test("replicas below one turn are pure rotations (invariant 3)") {
    val vs0 = vectors(0)
    for (i <- 1 until dim) {
      val expected = vs0.map(v => v.drop(i) ++ v.take(i))
      assert(vectors(i) === expected, s"replica $i is not rotation-by-$i")
    }
  }

  test("replicas at or past one turn are the masked rotation (not identity)") {
    val vs0 = vectors(0)
    // i = dim → rotation 0, turn 1: same magnitudes componentwise, but
    // the mask must have flipped at least one sign somewhere
    val vd = vectors(dim)
    assert(vd.map(_.map(math.abs)) === vs0.map(_.map(math.abs)))
    assert(vd !== vs0)
  }
}
