package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.table(spark, sf, "documents")
    .select("doc_id", "text")

  test("perplexity scores == independent local replica of the bigram LM") {
    val dim = 64
    val target = docs.filter(col("doc_id") % 2 === 0)
    val tgtCounts = NgramLm.hashedBigramCounts(target, "doc_id", "text", dim)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    val tot = new Array[Long](dim)
    tgtCounts.foreach { case (b, c) => tot(b) += c }
    val grid = NgramLm.logProbGrid(tot, alpha = 1.0)
    val rawCounts = NgramLm.hashedBigramCounts(docs, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = rawCounts.groupBy(_._1).map { case (id, rows) =>
      val n = rows.map(_._3).sum
      val nll = rows.map { case (_, b, c) => c * -grid(b) }.sum
      id -> (n, math.floor(nll.toDouble / n).toLong)
    }
    val got = NgramLm.perplexityScores(docs, target, "doc_id", "text", dim)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.size == docs.count())
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)} expected $e")
    }
    (got.keySet -- expected.keySet).foreach(id =>
      assert(got(id) == ((0L, 0L)), s"short doc $id: ${got(id)}"))
  }

  test("scores are bit-identical under any partition layout") {
    val target = docs.filter(col("doc_id") % 2 === 0)
    val a = NgramLm.perplexityScores(docs, target, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = NgramLm.perplexityScores(docs.repartition(13),
        target.repartition(7), "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("scrambled token order scores worse than the original text") {
    // target LM = real fixture prose; raw = one fixture doc verbatim vs
    // the same tokens reversed (identical unigram profile). The bigram
    // LM must find the reversal more perplexing.
    val target = docs.filter(col("doc_id") >= 10)
    val sample = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text"),
        array_join(reverse(split(col("text"), " ")), " ").as("rev"))
    val raw = sample.select(col("doc_id"), col("text"))
      .unionAll(sample.select(col("doc_id") + 100000, col("rev")))
    val scores = NgramLm.perplexityScores(raw, target, "doc_id", "text", 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val pairs = scores.keys.filter(_ < 100000).toSeq
    val worse = pairs.count(id => scores(id + 100000) > scores(id))
    assert(worse >= pairs.size * 3 / 4,
      s"only $worse of ${pairs.size} reversed docs scored worse")
  }

  test("worst(): k drop candidates, bounded top-k plan") {
    val target = docs.filter(col("doc_id") % 2 === 0)
    val out = NgramLm.worst(docs, target, "doc_id", "text", 64, k = 5)
    val rows = out.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(1)).toSeq == (1 to 5))
    val plan = NgramLm.worst(docs, target, "doc_id", "text", 64, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
