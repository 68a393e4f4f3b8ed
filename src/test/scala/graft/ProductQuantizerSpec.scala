package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{ProductQuantizer, Similarity}

/** PQ/ADC semantics on the fixture embeddings: codebook shapes, code
  * ranges, determinism, reconstruction sanity, and the recall bound the
  * ADC-then-exact-rerank pipeline must clear. */
class ProductQuantizerSpec extends SparkSpec {

  private def emb = Tables.table(spark, sf, "embeddings")
  private val Dim = 64

  test("codebooks: m x ksub x dsub, deterministic across retrains") {
    val b1 = ProductQuantizer.codebooks(emb, "vec_id", "embedding",
      Dim, m = 8, ksub = 16, iters = 2)
    val b2 = ProductQuantizer.codebooks(emb, "vec_id", "embedding",
      Dim, m = 8, ksub = 16, iters = 2)
    assert(b1.length == 8)
    assert(b1.forall(_.length == 16))
    assert(b1.forall(_.forall(_.length == 8)))
    assert(b1.map(_.map(_.toSeq).toSeq).toSeq ==
      b2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode: one code per subspace, every code in [0, ksub)") {
    val books = ProductQuantizer.codebooks(emb, "vec_id", "embedding",
      Dim, m = 8, ksub = 16, iters = 2)
    val codes = ProductQuantizer.encode(emb, "vec_id", "embedding", books)
      .collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8)
      assert(cs.forall(c => c >= 0 && c < 16), cs.toString)
    }
  }

  test("encode assigns each sub-vector to its true L2-nearest centroid") {
    val books = ProductQuantizer.codebooks(emb, "vec_id", "embedding",
      Dim, m = 4, ksub = 8, iters = 2)
    val vecs = emb.limit(50).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val got = ProductQuantizer.encode(
      emb.limit(50), "vec_id", "embedding", books)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    vecs.foreach { case (id, v) =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      val u = if (n == 0) v.map(_.toDouble) else v.map(_ / n)
      (0 until 4).foreach { s =>
        val x = u.slice(s * 16, (s + 1) * 16)
        val want = books(s).zipWithIndex.minBy { case (c, _) =>
          x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        }._2
        // float-vs-double rounding can flip a near-tie; allow the argmin
        // to differ only when the two distances are within 1e-6
        val gotC = got(id)(s)
        if (gotC != want) {
          val d = (j: Int) => x.zip(books(s)(j))
            .map { case (a, b) => (a - b) * (a - b) }.sum
          assert(math.abs(d(gotC) - d(want)) < 1e-6,
            s"vec $id subspace $s: got $gotC want $want")
        }
      }
    }
  }

  test("adcTopK: k rows per query, excludes self, recall@5 >= 0.8 after rerank") {
    val q = emb.filter(col("vec_id") < 10)
    val pq = ProductQuantizer.adcTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, m = 16, ksub = 16, iters = 3, rerank = 30)
    val rows = pq.collect()
    assert(rows.length == 50)
    assert(rows.forall(r =>
      r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))

    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = rows.count(r => exact(
      (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))))
    assert(hits >= 40, s"recall@5 = ${hits / 50.0} < 0.8")
  }

  test("ivfAdcTopK: k rows per query, recall@5 >= 0.7, list-routed candidates") {
    val q = emb.filter(col("vec_id") < 10)
    val out = ProductQuantizer.ivfAdcTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, nlist = 8, nprobe = 6, m = 16, ksub = 16,
      iters = 3, rerank = 30)
    val rows = out.collect()
    assert(rows.length == 50)
    assert(rows.forall(r =>
      r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))

    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = rows.count(r => exact(
      (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))))
    // the fixture's embeddings are near-random (no cluster structure),
    // so IVF recall is COVERAGE-bound: probing 6 of 8 lists sees ~75%
    // of the corpus and the residual codes + exact rerank must recover
    // most true neighbors within it (0.6 measured at nprobe=4 — right
    // at its 50% coverage ceiling, i.e. the PQ stage loses ~nothing)
    assert(hits >= 35, s"recall@5 = ${hits / 50.0} < 0.7")

    // the candidate join is an equi-join on the list id (broadcast
    // probes), never a full cross join of codes x queries
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("top_k_by"), plan.take(2000))
  }

  test("full-coverage shortlists degrade to exact brute force, bit-for-bit") {
    // rerank >= corpus: the ADC stage can drop nothing, so the exact
    // rerank must reproduce bruteForceTopK exactly — validates the
    // candidate plumbing independent of quantization quality
    val q = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val want = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val pq = ProductQuantizer.adcTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, m = 8, ksub = 8, iters = 1, rerank = n)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(pq == want, "adcTopK with full rerank != brute force")

    // nprobe = nlist: every list probed, so IVF-ADC covers everything too
    val ia = ProductQuantizer.ivfAdcTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, nlist = 4, nprobe = 4, m = 8, ksub = 8,
      iters = 1, rerank = n)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ia == want, "ivfAdcTopK with full coverage != brute force")
  }

  test("adcTopK plan: bounded-heap shortlist, no window; broadcast query side") {
    val q = emb.filter(col("vec_id") < 3)
    val plan = ProductQuantizer.adcTopK(emb, q, "vec_id", "embedding",
      k = 5, dim = Dim, rerank = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
