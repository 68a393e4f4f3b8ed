package graft

import org.apache.spark.sql.functions._
import graft.functions.SqlFunctions
import graft.functions.expressions.HashExpressions._
import graft.functions.expressions.TopKAggregate.top_k_by

/** The custom expressions are reachable from the SQL string surface and
  * agree exactly with their Column-API forms. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  SqlFunctions.register(spark)

  test("simhash64 and minhash_signature callable from SQL == Column API") {
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("docs_sqlfn")
    val sqlRes = spark.sql(
      """SELECT doc_id,
        |  simhash64(split(trim(text), '\\s+')) AS sh,
        |  size(minhash_signature(split(trim(text), '\\s+'), 64)) AS n_sig
        |FROM docs_sqlfn ORDER BY doc_id""".stripMargin)
      .as[(Long, Long, Int)].collect()
    val colRes = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        simhash64(split(trim(col("text")), "\\s+")).as("sh"),
        size(minhash_signature(split(trim(col("text")), "\\s+"), 64)).as("n"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect()
    assert(sqlRes.toSeq == colRes.toSeq)
    assert(sqlRes.forall(_._3 == 64))
  }

  test("top_k_by and dot_product_f work as SQL aggregates/scalars") {
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("emb_sqlfn")
    val sqlTop = spark.sql(
      """SELECT label, top_k_by(CAST(vec_id AS DOUBLE), vec_id, 3) AS top
        |FROM emb_sqlfn GROUP BY label""".stripMargin)
      .select(col("label"), col("top.corpus_id").as("ids"))
      .as[(Int, Seq[Long])].collect().toMap
    val colTop = spark.read.parquet(s"$sf/embeddings.parquet")
      .groupBy("label")
      .agg(top_k_by(col("vec_id").cast("double"), col("vec_id"), 3).as("top"))
      .select(col("label"), col("top.corpus_id").as("ids"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(sqlTop == colTop)
    assert(sqlTop.values.forall(_.length == 3))

    val d = spark.sql(
      "SELECT dot_product_f(embedding, embedding) AS d FROM emb_sqlfn " +
        "WHERE vec_id = 1").as[Double].head()
    val dCol = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") === 1)
      .select(dot_product_f(col("embedding"), col("embedding")).as("d"))
      .as[Double].head()
    assert(d == dCol)
  }

  test("kll sketch pipeline runs end-to-end from SQL") {
    graft.core.Tables.table(spark, sf, "events")
      .createOrReplaceTempView("ev_sqlfn")
    val q = spark.sql(
      """SELECT event_type,
        |  kll_quantiles(kll_merge_agg(sk, 200), 0.5D)[0] AS p50
        |FROM (SELECT event_type, CAST(ts AS DATE) AS day,
        |        kll_sketch_agg(CAST(value AS DOUBLE), 200) AS sk
        |      FROM ev_sqlfn GROUP BY event_type, CAST(ts AS DATE))
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
      .as[(String, Double)].collect()
    assert(q.nonEmpty && q.forall { case (_, p50) => !p50.isNaN })
    // KLL compaction is randomized (per the DataSketches design), so two
    // runs agree in RANK, not bit-for-bit: assert each SQL p50's true
    // rank, like KllSpec does
    val all = graft.core.Tables.table(spark, sf, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    q.foreach { case (et, p50) =>
      val xs = all(et)
      val rank = xs.count(_ <= p50).toDouble / xs.length
      assert(math.abs(rank - 0.5) <= 0.03, s"$et p50 $p50 at rank $rank")
    }
  }

  test("kll_quantiles accepts plain decimal literals and validates rank range") {
    graft.core.Tables.table(spark, sf, "events")
      .createOrReplaceTempView("ev_sqlfn_dec")
    // `0.5` parses as DECIMAL — must work identically to the `0.5D` form
    def p50(lit: String): Array[(String, Double)] = spark.sql(
      s"""SELECT event_type,
         |  kll_quantiles(kll_sketch_agg(CAST(value AS DOUBLE), 200),
         |    $lit)[0] AS p50
         |FROM ev_sqlfn_dec GROUP BY event_type ORDER BY event_type"""
        .stripMargin).as[(String, Double)].collect()
    val viaDecimal = p50("0.5")
    assert(viaDecimal.nonEmpty && viaDecimal.forall(!_._2.isNaN))
    // integer literal endpoints work too
    assert(p50("1").forall(!_._2.isNaN))
    // out-of-range rank rejected at analysis, not at runtime
    val e = intercept[Exception] {
      spark.sql("SELECT kll_quantiles(kll_sketch_agg(CAST(value AS DOUBLE)," +
        " 200), 1.5) FROM ev_sqlfn_dec").collect()
    }
    assert(e.getMessage.contains("[0,1]"), e.getMessage)
  }

  test("non-literal k fails loudly at analysis, not in executors") {
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("emb_sqlfn2")
    val e = intercept[Exception] {
      spark.sql("SELECT top_k_by(1.0, vec_id, vec_id) FROM emb_sqlfn2")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
