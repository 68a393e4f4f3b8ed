package graft

import org.apache.spark.sql.functions._
import graft.operators.TextSearch

/** Property tests for the 1e-9 integer-grid floor that makes BM25 and
  * hashed TF-IDF layout-independent — the linchpin under four pinned
  * oracles (text_search_bm25, tfidf_knn, tfidf_ivfadc_knn, and the
  * incremental search probe). Three layers:
  *
  *   1. the per-term contribution FORMULA evaluated by Spark (codegen)
  *      equals a local double replica in the same operation order, across
  *      randomized inputs plus the boundary shelf (df == N, huge df/tf,
  *      dl/avgdl extremes, contributions within 1 ulp of a grid line);
  *   2. the full bm25TopK pipeline is bit-identical under different
  *      partition layouts AND equals an independent local BM25 with
  *      grid-floored Long sums (score + tie-break order);
  *   3. hashedTfIdf vectors likewise (layouts + local replica).
  *
  * Spark-backed, so few-but-adversarial cases (the PropertySpecs
  * convention), seeded for reproducibility.
  */
class GridBoundarySpec extends SparkSpec {

  import spark.implicits._

  // ---- the formula replica (operation order matches scoreBm25) ----
  private def contribLocal(n: Long, df: Long, tf: Long, dl: Long,
      avgdl: Double, k1: Double, b: Double): Long = {
    val idf = math.log(
      (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    val tfNorm = (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * ((1.0 - b) + b * dl.toDouble / avgdl))
    math.floor(idf * tfNorm * 1e9).toLong
  }

  test("contribution formula: Spark codegen == local replica at the boundaries") {
    val rnd = new scala.util.Random(42)
    val boundary = Seq(
      // df == N (idf at its floor), df = 1, singleton corpus
      (100L, 100L, 1L, 10L), (100L, 1L, 1L, 10L), (1L, 1L, 1L, 1L),
      // huge df/tf/dl (far beyond any real corpus — cast exactness)
      (1000000000000L, 999999999999L, 1L, 1L),
      (100L, 3L, 1000000000000L, 1000000000L),
      (100L, 3L, 1L, 1000000000L))
    val random = Seq.fill(400) {
      val n = 1L + rnd.nextLong(1000000000000L)
      (n, 1L + rnd.nextLong(n), 1L + rnd.nextLong(100000L),
        1L + rnd.nextLong(1000000L))
    }
    for (avgdl <- Seq(1e-6, 0.5, 1.0, 250.0, 1e9);
         (k1, b) <- Seq((1.2, 0.75), (2.0, 0.0), (0.0, 1.0))) {
      val cases = boundary ++ random
      // one Spark job per (avgdl, k1, b): n rides as a column-dependent
      // lit-free expression to keep every case in one DataFrame
      val got = cases.toDF("n", "df", "tf", "dl")
        .select(floor(
          log((col("n").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)) + lit(1.0)) *
          ((col("tf").cast("double") * (lit(k1) + 1.0)) /
            (col("tf").cast("double") + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl)))) *
          lit(1e9)).cast("bigint"))
        .collect().map(_.getLong(0)).toSeq
      val want = cases.map { case (n, df, tf, dl) =>
        contribLocal(n, df, tf, dl, avgdl, k1, b) }
      assert(got == want, s"avgdl=$avgdl k1=$k1 b=$b")
    }
  }

  test("grid values within 1 ulp of a grid line floor identically in Spark") {
    // doubles straddling exact integers up to the 2^53 exactness edge:
    // floor through codegen must agree with math.floor on k, nextUp(k),
    // nextDown(k) — the class of input the 1e-9 grid lands on whenever a
    // contribution is exactly representable
    val ks = Seq(0L, 1L, 2L, 999999999L, 1000000000L, 123456789012L,
      (1L << 52) - 1, 1L << 52)
    val xs = ks.flatMap { k =>
      val d = k.toDouble
      Seq(d, Math.nextUp(d), Math.nextDown(d), -d, Math.nextUp(-d),
        Math.nextDown(-d))
    }
    val got = xs.toDF("x").select(floor(col("x")).cast("bigint"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == xs.map(x => math.floor(x).toLong))
  }

  // ---- full-pipeline properties on randomized micro-corpora ----

  private def corpus(seed: Int): (Seq[(Long, String)], Seq[(Long, String)]) = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 12).map(i => s"t$i")
    val docs = (0L until (20 + rnd.nextInt(20)).toLong).map { id =>
      // empty docs included: they count toward N/avgdl with dl = 0
      val len = rnd.nextInt(31)
      (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val queries = (0L until 4L).map { qid =>
      val terms = Seq.fill(1 + rnd.nextInt(4))(
        if (rnd.nextInt(5) == 0) "unseen" else vocab(rnd.nextInt(vocab.size)))
      (qid, terms.mkString(" "))
    }
    (docs, queries)
  }

  /** Independent local BM25 with the same grid: per-(query, doc) Long
    * sums of contribLocal, ranked score desc then doc_id asc (the
    * top_k_by tie-break). */
  private def bm25Local(docs: Seq[(Long, String)],
      queries: Seq[(Long, String)], k: Int): Seq[(Long, Int, Long, Long)] = {
    def toks(s: String) =
      if (s.trim.isEmpty) Seq.empty[String] else s.trim.split("\\s+").toSeq
    val n = docs.size.toLong
    val dls = docs.map { case (id, t) => id -> toks(t).size.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n.toDouble
    val tfs = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => (w, id, g.size.toLong) } }
    val dfm = tfs.groupBy(_._1).map { case (w, g) =>
      w -> g.map(_._2).distinct.size.toLong }
    queries.flatMap { case (qid, qt) =>
      val scores = toks(qt).distinct.filter(dfm.contains).flatMap { w =>
        tfs.filter(_._1 == w).map { case (_, id, tf) =>
          id -> contribLocal(n, dfm(w), tf, dls(id), avgdl, 1.2, 0.75) } }
        .groupBy(_._1).map { case (id, g) => id -> g.map(_._2).sum }
      scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
        .zipWithIndex.map { case ((id, s), i) => (qid, i + 1, id, s) }
    }
  }

  test("bm25TopK: layout-independent and == the local grid reference") {
    for (seed <- 0 until 6) {
      val (docs, queries) = corpus(seed)
      val want = bm25Local(docs, queries, k = 50)
      for (parts <- Seq(1, 17)) {
        val got = TextSearch.bm25TopK(
          docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
          queries.toDF("query_id", "query_text").repartition(
            math.min(parts, 3)),
          "query_id", "query_text", k = 50)
          .orderBy("query_id", "rank")
          .collect().map(r =>
            (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
        assert(got == want, s"seed=$seed parts=$parts")
      }
    }
  }

  test("hashedTfIdf: layout-independent and == the local grid replica") {
    def toks(s: String) =
      if (s.trim.isEmpty) Seq.empty[String] else s.trim.split("\\s+").toSeq
    for (seed <- 0 until 4) {
      val (docs, _) = corpus(seed)
      val dim = 16
      // local replica: smooth idf on the grid, Long bucket sums. The
      // bucket is Spark's Murmur3 hash(term) — recomputed via the same
      // expression rather than reimplemented (only the GRID math is
      // under test here; bucket assignment is any stable hash)
      val terms = docs.flatMap { case (_, t) => toks(t) }.distinct
      val bucketOf = terms.zip(
        terms.toDF("t")
          .select(pmod(hash(col("t")), lit(dim)).cast("int"))
          .collect().map(_.getInt(0))).toMap
      val n = docs.size.toLong
      val tfs = docs.flatMap { case (id, t) =>
        toks(t).groupBy(identity).map { case (w, g) =>
          (w, id, g.size.toLong) } }
      val dfm = tfs.groupBy(_._1).map { case (w, g) =>
        w -> g.map(_._2).distinct.size.toLong }
      def idfE9(df: Long): Long =
        math.floor((math.log((n.toDouble + 1.0) / (df.toDouble + 1.0)) + 1.0)
          * 1e9).toLong
      val want = docs.map { case (id, t) =>
        val w9 = new Array[Long](dim)
        toks(t).groupBy(identity).foreach { case (w, g) =>
          w9(bucketOf(w)) += g.size.toLong * idfE9(dfm(w)) }
        id -> w9.map(v => (v.toDouble / 1e9).toFloat).toSeq
      }.sortBy(_._1)
      for (parts <- Seq(1, 17)) {
        val got = TextSearch.hashedTfIdf(
          docs.toDF("doc_id", "text").repartition(parts),
          "doc_id", "text", dim)
          .orderBy("doc_id")
          .collect().map(r =>
            (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
        assert(got == want, s"seed=$seed parts=$parts")
      }
    }
  }
}
