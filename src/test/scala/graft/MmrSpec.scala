package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Greedy MMR rerank semantics: λ=1 degrades to plain top-k, the greedy
  * trace matches a local replica, clusters get broken up at low λ, and
  * the selection is layout/array-order independent. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.table(spark, sf, "embeddings")
  private val Dim = 64

  test("lambda = 1 reproduces the exact top-k, same order") {
    val q = emb.filter(col("vec_id") < 5)
    val want = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "rank", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = Similarity.mmrTopK(emb, q, "vec_id", "embedding",
      k = 5, lambda = 1.0, shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("greedy selection matches a local replica at lambda = 0.7") {
    val q = emb.filter(col("vec_id") < 10)
    val R = 30; val k = 5; val lam = 0.7
    val cand = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", R)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var sa = 0.0; var sb = 0.0; var d = 0.0
      for (i <- a.indices) {
        sa += a(i).toDouble * a(i); sb += b(i).toDouble * b(i)
        d += a(i).toDouble * b(i)
      }
      if (sa == 0 || sb == 0) 0.0 else d / (math.sqrt(sa) * math.sqrt(sb))
    }
    val want = cand.groupBy(_._1).flatMap { case (qid, rows) =>
      var remaining = rows.map(r => (r._2, r._3)).toBuffer
      val sel = scala.collection.mutable.Buffer.empty[Long]
      while (sel.size < k && remaining.nonEmpty) {
        val best = remaining.minBy { case (id, sim) =>
          val pen = if (sel.isEmpty) 0.0
            else sel.map(s => cos(vecs(id), vecs(s))).max
          (-(lam * sim - (1 - lam) * pen), id)
        }
        sel += best._1
        remaining = remaining.filterNot(_._1 == best._1)
      }
      sel.zipWithIndex.map { case (id, i) => (qid, i + 1, id) }
    }.toSet
    val got = Similarity.mmrTopK(emb, q, "vec_id", "embedding",
      k = k, lambda = lam, shortlist = R)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("low lambda breaks up a tight cluster; plain top-k does not") {
    // corpus: 5 near-copies of direction A (highest sims), 1 vector
    // near direction B; query = between, closer to A
    def v(main: Int, eps: Float, idx: Int): Seq[Float] = {
      val a = Array.fill(8)(0f)
      a(main) = 1f
      a(7) = eps * idx
      a.toSeq
    }
    val corpus = ((1 to 5).map(i => (i.toLong, v(0, 0.01f, i))) :+
      (6L, v(1, 0.01f, 1))).toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val query = Seq((100L, Seq(1f, 0.45f, 0f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val plain = Similarity.bruteForceTopK(corpus, query, "vec_id",
      "embedding", 2).select("corpus_id")
      .collect().map(_.getLong(0)).toSet
    assert(plain.subsetOf(Set(1L, 2L, 3L, 4L, 5L)), plain.toString)
    val mmr = Similarity.mmrTopK(corpus, query, "vec_id", "embedding",
      k = 2, lambda = 0.5, shortlist = 6)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(mmr.contains(6L), s"diversity pick missing: $mmr")
  }

  test("deterministic under repartition and candidate-array order") {
    val q = emb.filter(col("vec_id") < 10)
    val a = Similarity.mmrTopK(emb, q, "vec_id", "embedding",
      k = 5, lambda = 0.7).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = Similarity.mmrTopK(emb.repartition(7), q, "vec_id",
      "embedding", k = 5, lambda = 0.7)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a == b)
  }
}
