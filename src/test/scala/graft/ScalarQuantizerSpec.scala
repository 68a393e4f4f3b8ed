package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{ProductQuantizer, ScalarQuantizer, Similarity}

/** SQ8 semantics on the fixture embeddings: exact bounds, code ranges,
  * per-dimension reconstruction error bound, determinism under layout,
  * and the near-exact recall the 8-bit grid + exact rerank must clear. */
class ScalarQuantizerSpec extends SparkSpec {

  private def emb = Tables.table(spark, sf, "embeddings")
  private val Dim = 64

  test("bounds: exact per-dim min/max of unit vectors, layout-independent") {
    val b1 = ScalarQuantizer.bounds(emb, "embedding", Dim)
    val b2 = ScalarQuantizer.bounds(emb.repartition(17), "embedding", Dim)
    assert(b1.dim == Dim)
    assert(b1.mins.toSeq == b2.mins.toSeq)
    assert(b1.scales.toSeq == b2.scales.toSeq)
    assert(b1.scales.forall(_ >= 0.0))

    // spot-check dim 0 against a local replica of the unit normalization
    val vals = emb.select("embedding").collect().map { r =>
      val v = r.getSeq[Float](0)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      // Spark-side unit(): (x.toDouble / n).toFloat, then read as double
      (if (n == 0) v(0) else (v(0) / n).toFloat).toDouble
    }
    assert(b1.mins(0) == vals.min)
    assert(math.abs(b1.mins(0) + 255 * b1.scales(0) - vals.max) < 1e-12)
  }

  test("encode: dim codes per row, all in [0, 255], reconstruction within half a step") {
    val b = ScalarQuantizer.bounds(emb, "embedding", Dim)
    val rows = ScalarQuantizer.encode(emb, "vec_id", "embedding", b)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      val v = r.getSeq[Float](2)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      val u = if (n == 0) v.map(_.toDouble)
        else v.map(x => (x / n).toFloat.toDouble)
      assert(cs.length == Dim)
      assert(cs.forall(c => c >= 0 && c <= 255))
      (0 until Dim).foreach { d =>
        val dec = b.mins(d) + cs(d) * b.scales(d)
        // |decode - u_d| <= scale/2 (+ tiny slack for the affine float ops)
        assert(math.abs(dec - u(d)) <= b.scales(d) / 2 + 1e-9,
          s"dim $d: dec=$dec u=${u(d)} scale=${b.scales(d)}")
      }
    }
  }

  test("sqTopK: k rows per query, excludes self, near-exact recall@5") {
    val q = emb.filter(col("vec_id") < 10)
    val sq = ScalarQuantizer.sqTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, rerank = 30)
    val rows = sq.collect()
    assert(rows.length == 50)
    assert(rows.forall(r =>
      r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))

    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = rows.count(r => exact(
      (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))))
    // 8 bits/dim ≈ exact on near-random unit vectors; PQ's floor here
    // is 0.8, SQ8 must do strictly better
    assert(hits >= 47, s"recall@5 = ${hits / 50.0} < 0.94")
  }

  test("full-coverage shortlist degrades to exact brute force, bit-for-bit") {
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val want = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = ScalarQuantizer.sqTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, rerank = n)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want, "sqTopK with full rerank != brute force")
  }

  test("deterministic under repartition: identical rows either layout") {
    val q = emb.filter(col("vec_id") < 10)
    val a = ScalarQuantizer.sqTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, rerank = 30)
      .collect().map(_.toSeq).toSeq
    val b = ScalarQuantizer.sqTopK(emb.repartition(7), q, "vec_id",
      "embedding", k = 5, dim = Dim, rerank = 30)
      .collect().map(_.toSeq).toSeq
    assert(a.sortBy(_.toString) == b.sortBy(_.toString))
  }

  test("ivfSqTopK: k rows per query, recall@5 >= 0.7 at 6/8 coverage, list-routed") {
    val q = emb.filter(col("vec_id") < 10)
    val out = graft.operators.ScalarQuantizer.ivfSqTopK(emb, q, "vec_id",
      "embedding", k = 5, dim = Dim, nlist = 8, nprobe = 6, iters = 3,
      rerank = 30)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(r =>
      r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = rows.count(r => exact(
      (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))))
    // coverage-bound like IVF-ADC (6/8 lists ≈ 75% of a near-random
    // corpus); within covered lists SQ8 residual codes lose ~nothing
    assert(hits >= 35, s"recall@5 = ${hits / 50.0} < 0.7")

    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("top_k_by"), plan.take(2000))
  }

  test("ivfSqTopK full coverage + full rerank degrades to exact brute force") {
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val want = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = graft.operators.ScalarQuantizer.ivfSqTopK(emb, q, "vec_id",
      "embedding", k = 5, dim = Dim, nlist = 4, nprobe = 4, iters = 1,
      rerank = n)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want, "ivfSqTopK with full coverage != brute force")
  }

  test("plan: bounded-heap shortlist, no window, broadcast query side") {
    val q = emb.filter(col("vec_id") < 3)
    val plan = ScalarQuantizer.sqTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, rerank = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
