package graft

import org.apache.spark.sql.functions._
import graft.operators.TextSearch
import scala.jdk.CollectionConverters._

/** BM25 distributed assembly vs an independent local reference (same
  * formula, same Java Math.log, same 1e-9 floor grid) on the fixture
  * corpus — the distributed postings/df/stats/score/heap pipeline must
  * agree exactly. */
class TextSearchSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private val Queries = Seq("spark window agg", "customer join", "zzznope")

  private def localBm25(corpus: Seq[(Long, Seq[String])],
      query: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : Map[Long, Long] = {
    val n = corpus.size
    val avgdl = corpus.map(_._2.size).sum.toDouble / n
    val dfm = corpus.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, g) => t -> g.size }
    corpus.flatMap { case (id, ts) =>
      val tl = ts.size
      val score = query.distinct.filter(dfm.contains).map { term =>
        val tf = ts.count(_ == term)
        if (tf == 0) 0L
        else {
          val df = dfm(term)
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          val tfn = tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * tl / avgdl))
          math.floor(idf * tfn * 1e9).toLong
        }
      }.sum
      if (score != 0L) Some(id -> score) else None
    }.toMap
  }

  test("bm25TopK == local reference scores; k-bounded; empty-match query absent") {
    val q = TextSearch.queriesDf(spark, Queries)
    val got = TextSearch.bm25TopK(docs, "doc_id", "text", q,
      "query_id", "query_text", k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    val corpus = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))

    Queries.zipWithIndex.foreach { case (qs, qi) =>
      val want = localBm25(corpus, qs.split(" ").toSeq)
      val mine = got.filter(_._1 == qi)
      assert(mine.length == math.min(10, want.size),
        s"query $qi row count")
      // every returned (doc, score) matches the reference score, and the
      // scores are the reference's top-k in descending order
      mine.foreach { case (_, _, doc, s) =>
        assert(want(doc) == s, s"query $qi doc $doc")
      }
      val topRef = want.values.toSeq.sorted(Ordering[Long].reverse)
        .take(math.min(10, want.size))
      assert(mine.sortBy(_._2).map(_._4).toSeq == topRef,
        s"query $qi top-k scores")
    }
    assert(!got.exists(_._1 == 2L), "no-match query must return no rows")
  }

  test("hashedTfIdf == local reference; empty doc -> zero vector; one row per doc") {
    val dim = 32
    val withEmpty = docs.limit(80).select(col("doc_id"),
      when(col("doc_id") === 3, lit("")).otherwise(col("text")).as("text"))
    val got = TextSearch.hashedTfIdf(withEmpty, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap

    val corpus = withEmpty.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).filter(_.nonEmpty)))
    // bucket via the SAME Spark hash (murmur3, seed 42) evaluated in-engine
    val terms = corpus.flatMap(_._2).distinct
    val bucketOf = spark.createDataFrame(
        terms.map(org.apache.spark.sql.Row(_)).toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("term",
            org.apache.spark.sql.types.StringType))))
      .select(col("term"), pmod(hash(col("term")), lit(dim)).as("b"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toMap

    val n = corpus.length
    val dfm = corpus.flatMap(_._2.distinct).groupBy(identity)
      .map { case (t, g) => t -> g.size }
    corpus.foreach { case (id, ts) =>
      val w9 = Array.fill(dim)(0L)
      ts.groupBy(identity).foreach { case (t, occ) =>
        val idf9 = math.floor(
          (math.log((n + 1.0) / (dfm(t) + 1.0)) + 1.0) * 1e9).toLong
        w9(bucketOf(t)) += occ.size * idf9
      }
      val want = w9.map(v => (v.toDouble / 1e9).toFloat).toSeq
      assert(got(id) == want, s"doc $id")
    }
    assert(got.size == 80)
    assert(got(3L).forall(_ == 0f), "empty doc must be the zero vector")
  }

  test("plan: postings partial-aggregate; no window; query side broadcast") {
    val q = TextSearch.queriesDf(spark, Seq("spark"))
    val plan = TextSearch.bm25TopK(docs, "doc_id", "text", q,
      "query_id", "query_text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_by"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
