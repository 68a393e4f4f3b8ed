package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{QualityModel, TextSearch}

class QualityModelSpec extends SparkSpec {

  private def docs = Tables.table(spark, sf, "documents")

  /** Unitized tf-idf vectors + the heuristic-gate weak label the query
    * uses (stopword ratio ≥ 0.06). */
  private def labeled = {
    val vecs = TextSearch.hashedTfIdf(docs, "doc_id", "text", dim = 64)
    val ratio = TextFunctions.qualityStats(col("text"))(4)
    vecs.select(col("doc_id"),
        QualityModel.unitize(col("tfidf")).as("tfidf"))
      .join(docs.select(col("doc_id"),
        (ratio >= 0.06).cast("int").as("label")), Seq("doc_id"))
  }

  test("ridge probe fits: MSE beats the zero model and the mean model") {
    val data = labeled.cache()
    val m = QualityModel.train(data, "doc_id", "tfidf", "label", 64)
    val fitted = QualityModel.mse(data, "tfidf", "label", m)
    val zero = QualityModel.mse(data, "tfidf", "label",
      QualityModel.Model(Array.fill(64)(0.0f), 0.0))
    val posFrac = data.agg(avg("label")).collect()(0).getDouble(0)
    val meanModel = QualityModel.mse(data, "tfidf", "label",
      QualityModel.Model(Array.fill(64)(0.0f), posFrac))
    assert(fitted < meanModel, s"fit $fitted >= intercept-only $meanModel")
    assert(fitted < zero, s"fit $fitted >= zero $zero")
  }

  test("learned probe beats the majority-class baseline on its labels") {
    val data = labeled.cache()
    val m = QualityModel.train(data, "doc_id", "tfidf", "label", 64)
    val scored = data.select(col("label"),
      (QualityModel.margin(col("tfidf"), m) >= 0.5).cast("int").as("pred"))
    val Array(r) = scored.select(
      sum((col("label") === col("pred")).cast("int")).as("correct"),
      sum("label").as("pos"), count(lit(1)).as("n")).collect()
    val (correct, pos, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val majority = math.max(pos, n - pos).toDouble / n
    val acc = correct.toDouble / n
    assert(acc > majority, s"acc $acc <= majority baseline $majority")
    assert(acc >= 0.75, s"acc $acc — the heuristic gate should be learnable")
  }

  test("weights are bit-identical under any partition layout") {
    val data = labeled
    val a = QualityModel.train(data, "doc_id", "tfidf", "label", 64)
    val b = QualityModel.train(data.repartition(13), "doc_id", "tfidf",
      "label", 64)
    assert(a.weights.toSeq == b.weights.toSeq)
    assert(a.bias == b.bias)
  }

  test("all-zero vector (term-less doc) scores clamp(bias); scoring is map-only") {
    import spark.implicits._
    val m = QualityModel.Model(Array.tabulate(4)(i => (i + 1).toFloat), 0.25)
    val df = Seq(Array(0.0f, 0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f, 0.0f))
      .toDF("v")
    val out = df.select(QualityModel.score(col("v"), m).as("p")).collect()
    assert(out(0).getDouble(0) == 0.25) // w·0 + b
    assert(out(1).getDouble(0) == 1.0)  // 1·1 + 0.25 clamped
    val plan = df.select(QualityModel.score(col("v"), m))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("unitize: unit norm for nonzero vectors, zero vector unchanged") {
    import spark.implicits._
    val df = Seq(Array(3.0f, 4.0f), Array(0.0f, 0.0f)).toDF("v")
    val rows = df.select(QualityModel.unitize(col("v")).as("u")).collect()
      .map(_.getSeq[Float](0))
    assert(math.abs(rows(0).map(x => x * x).sum - 1.0f) < 1e-6)
    assert(rows(0)(0) == 0.6f && rows(0)(1) == 0.8f)
    assert(rows(1) == Seq(0.0f, 0.0f))
  }
}
