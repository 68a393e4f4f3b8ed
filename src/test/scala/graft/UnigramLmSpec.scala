package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.core.Tables
import graft.operators.UnigramLm
import graft.functions.expressions.{UnigramEStep, UnigramViterbi,
  UnigramExpressions}

/** Unigram-LM tokenizer (Kudo 2018): the expression DPs against local
  * replicas, training layout-independence (the pinned-oracle
  * precondition), and encode invariants. */
class UnigramLmSpec extends SparkSpec {

  private def docs = Tables.table(spark, sf, "documents")

  // ---- local replicas (same grid, same iteration order) ----

  private def localEStep(w: String, pieces: Array[String],
      grid: Array[Long]): Map[Int, Long] = {
    val id = pieces.zipWithIndex.toMap
    val p = grid.map(g => math.exp(g * 1e-9))
    val maxLen = if (pieces.isEmpty) 1 else pieces.map(_.length).max
    val n = w.length
    val alpha = Array.fill(n + 1)(0.0); alpha(0) = 1.0
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i))
      id.get(w.substring(i - l, i)).foreach(j =>
        alpha(i) += alpha(i - l) * p(j))
    val z = alpha(n)
    if (z == 0.0) return Map.empty
    val beta = Array.fill(n + 1)(0.0); beta(n) = 1.0
    for (i <- n - 1 to 0 by -1; l <- 1 to math.min(maxLen, n - i))
      id.get(w.substring(i, i + l)).foreach(j =>
        beta(i) += p(j) * beta(i + l))
    val acc = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    for (s <- 0 until n; l <- 1 to math.min(maxLen, n - s))
      id.get(w.substring(s, s + l)).foreach { j =>
        acc(j) = acc.getOrElse(j, 0.0) + alpha(s) * p(j) * beta(s + l) / z
      }
    acc.iterator.map { case (j, c) => j -> math.floor(1e9 * c).toLong }
      .filter(_._2 > 0).toMap
  }

  private def evalEStep(w: String, v: UnigramLm.Vocab): Map[Int, Long] = {
    val e = UnigramEStep(org.apache.spark.sql.catalyst.expressions.Literal(w),
      v.pieces, v.logpGrid)
    val arr = e.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      r.getInt(0) -> r.getLong(1)
    }.toMap
  }

  private def evalViterbi(w: String, v: UnigramLm.Vocab): Seq[String] = {
    val e = UnigramViterbi(
      org.apache.spark.sql.catalyst.expressions.Literal(w),
      v.pieces, v.logpGrid)
    val arr = e.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private def tinyVocab(ps: (String, Double)*): UnigramLm.Vocab = {
    val sorted = ps.sortBy(_._1)
    UnigramLm.Vocab(sorted.map(_._1).toArray,
      sorted.map(p => math.floor(1e9 * math.log(p._2)).toLong).toArray)
  }

  test("E-step expression == local forward-backward replica") {
    val v = tinyVocab("a" -> 0.3, "b" -> 0.2, "ab" -> 0.25, "ba" -> 0.15,
      "aba" -> 0.1)
    for (w <- Seq("ab", "aba", "abab", "bbbb", "a", "ababababab"))
      assert(evalEStep(w, v) == localEStep(w, v.pieces, v.logpGrid), w)
  }

  test("E-step posteriors sum to the word's expected piece count") {
    // Σ_pieces E[count] = expected segmentation length — for "ab" with
    // segmentations [ab] (p=.25) and [a][b] (p=.06): E = (.25*1 + .06*2)/.31
    val v = tinyVocab("a" -> 0.3, "b" -> 0.2, "ab" -> 0.25)
    val e = evalEStep("ab", v)
    val total = e.values.sum
    val pAb = 0.25; val pASplit = 0.3 * 0.2
    val expect = (pAb + 2 * pASplit) / (pAb + pASplit)
    assert(math.abs(total * 1e-9 - expect) < 1e-6, s"$total vs $expect")
  }

  test("uncoverable word returns empty posterior, not a crash") {
    val v = tinyVocab("ab" -> 1.0) // no single chars: "aab" uncoverable
    assert(evalEStep("aab", v).isEmpty)
    assert(evalEStep("ab", v).nonEmpty)
  }

  test("Viterbi expression: optimal on the grid, total with unknowns") {
    val v = tinyVocab("a" -> 0.3, "b" -> 0.2, "ab" -> 0.25, "abab" -> 0.02)
    // brute-force max over all segmentations (grid scores, unknown=UnkGrid)
    def brute(w: String): Long = {
      val id = v.pieces.zipWithIndex.toMap
      def go(i: Int): Seq[(Long, List[String])] =
        if (i == w.length) Seq((0L, Nil))
        else (i + 1 to w.length).flatMap { j =>
          val piece = w.substring(i, j)
          val sc = id.get(piece).map(v.logpGrid(_))
            .orElse(if (j - i == 1) Some(UnigramExpressions.UnkGrid) else None)
          sc.toSeq.flatMap(s => go(j).map { case (t, ps) =>
            (s + t, piece :: ps) })
        }
      go(0).map(_._1).max
    }
    def score(pieces: Seq[String]): Long = {
      val id = v.pieces.zipWithIndex.toMap
      pieces.map(p => id.get(p).map(v.logpGrid(_))
        .getOrElse(UnigramExpressions.UnkGrid)).sum
    }
    for (w <- Seq("abab", "aab", "ba", "axb", "xyz")) {
      val got = evalViterbi(w, v)
      assert(got.mkString == w, s"concat invariant broken for $w: $got")
      assert(score(got) == brute(w), s"$w: ${score(got)} vs ${brute(w)}")
    }
  }

  test("training is layout-independent (the pinned-oracle precondition)") {
    val d = docs.limit(200).localCheckpoint(true)
    try {
      val v1 = UnigramLm.train(d.repartition(1), "text",
        seedSize = 200, maxPieceLen = 3, emIters = 2, vocabSize = 80)
      val v16 = UnigramLm.train(d.repartition(16), "text",
        seedSize = 200, maxPieceLen = 3, emIters = 2, vocabSize = 80)
      assert(v1.pieces.toSeq == v16.pieces.toSeq)
      assert(v1.logpGrid.toSeq == v16.logpGrid.toSeq)
    } finally d.unpersist()
  }

  test("EM improves corpus likelihood under the model") {
    import spark.implicits._
    val corpus = Seq.fill(40)("hello world") ++ Seq.fill(20)("held word")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val v0 = UnigramLm.train(df, "text", seedSize = 120, maxPieceLen = 4,
      emIters = 0, vocabSize = 120)
    val v2 = UnigramLm.train(df, "text", seedSize = 120, maxPieceLen = 4,
      emIters = 2, vocabSize = 120)
    // likelihood of the corpus words under each model (exact lattice Z,
    // same arithmetic as the E-step)
    def ll(v: UnigramLm.Vocab): Double = {
      val id = v.pieces.zipWithIndex.toMap
      val p = v.logpGrid.map(g => math.exp(g * 1e-9))
      val maxLen = v.pieces.map(_.length).max
      def z(w: String): Double = {
        val alpha = Array.fill(w.length + 1)(0.0); alpha(0) = 1.0
        for (i <- 1 to w.length; l <- 1 to math.min(maxLen, i))
          id.get(w.substring(i - l, i)).foreach(j =>
            alpha(i) += alpha(i - l) * p(j))
        alpha(w.length)
      }
      Seq("hello" -> 40.0, "world" -> 40.0, "held" -> 20.0, "word" -> 20.0)
        .map { case (w, c) => c * math.log(z(w)) }.sum
    }
    assert(ll(v2) > ll(v0), s"${ll(v2)} vs ${ll(v0)}")
  }

  test("encode: vocab-bounded DP, position-sorted rebuild, empty docs") {
    import spark.implicits._
    val df = Seq((1L, "hello world hello"), (2L, ""), (3L, "held zzz"))
      .toDF("doc_id", "text")
    val v = UnigramLm.train(df.filter(col("doc_id") =!= 3), "text",
      seedSize = 100, maxPieceLen = 4, emIters = 1, vocabSize = 100)
    val enc = UnigramLm.encode(df, "doc_id", "text", v)
      .orderBy("doc_id").collect()
    assert(enc.length == 3)
    val r1 = enc(0).getSeq[String](1)
    assert(r1.mkString == "helloworldhello")
    assert(enc(1).getSeq[String](1).isEmpty) // empty doc keeps its row
    // "zzz": z unseen in training → unknown single chars
    val r3 = enc(2).getSeq[String](1)
    assert(r3.containsSlice(Seq("z", "z", "z")), r3.toString)
  }

  test("fixture docs round-trip: pieces concatenate back to the words") {
    val d = docs.limit(50)
    val v = UnigramLm.trainCached(d, "text", seedSize = 300,
      maxPieceLen = 4, emIters = 1, vocabSize = 150, cacheKey = "spec50")
    val bad = d
      .select(col("doc_id"), explode(graft.functions.TextFunctions
        .tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .select(col("w"),
        graft.functions.expressions.UnigramExpressions
          .unigram_viterbi(col("w"), v.pieces, v.logpGrid).as("enc"))
      .filter(array_join(col("enc"), "") =!= col("w"))
      .count()
    assert(bad == 0)
  }
}
