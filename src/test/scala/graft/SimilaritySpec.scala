package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.expressions.HashExpressions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private def emb = Tables.table(spark, sf, "embeddings")

  test("dot_product_f matches zip_with+aggregate composition") {
    val composed = emb.select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
    val custom = emb.select(col("vec_id"),
      dot_product_f(col("embedding"), col("embedding")).as("d"))
    val joined = composed.as("a").join(custom.as("b"), "vec_id")
      .filter(abs(col("a.d") - col("b.d")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("brute-force topk: sim in [-1,1], k rows per query, excludes self") {
    val q = emb.filter(col("vec_id") < 3)
    val out = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
    val rows = out.collect()
    assert(rows.length == 15)
    assert(rows.forall(r => math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-12))
    assert(rows.forall(r =>
      r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))
  }

  test("brute-force topk plan: bounded-heap aggregate, no window funnel") {
    val q = emb.filter(col("vec_id") < 3)
    val out = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
    val plan = out.queryExecution.executedPlan.toString
    // the per-query top-k must be an ObjectHashAggregate over top_k_by
    // (partial map-side + final), NOT a Window: a window partitioned by
    // query_id shuffles every scored row to #queries reducers.
    assert(plan.contains("top_k_by"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    // partial aggregation happens before the exchange: the partial
    // top_k_by appears below the shuffle in the plan tree
    assert(plan.contains("partial_top_k_by") || plan.contains("partial top_k_by")
      || "partial".r.findAllIn(plan).nonEmpty, plan)
  }

  test("top_k_by heap == sort-take on random data (property)") {
    val rnd = new scala.util.Random(7)
    val heap = new graft.functions.expressions.TopKHeap(10)
    val items = Array.fill(500)((rnd.nextDouble(), rnd.nextLong()))
    items.foreach { case (s, i) => heap.offer(s, i) }
    val expect = items.sortBy { case (s, i) => (-s, i) }.take(10).toSeq
    assert(heap.sorted.toSeq == expect)
    // merge path: two disjoint halves merged == global top-10
    val h1 = new graft.functions.expressions.TopKHeap(10)
    val h2 = new graft.functions.expressions.TopKHeap(10)
    items.take(250).foreach { case (s, i) => h1.offer(s, i) }
    items.drop(250).foreach { case (s, i) => h2.offer(s, i) }
    assert(h1.mergeFrom(h2).sorted.toSeq == expect)
  }

  test("banded LSH topk recalls most of the exact top-5") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, q, "vec_id", "embedding", 5, 64,
        bitsPerBand = 4, numBands = 6)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("nearDupPairs finds the top cosine pairs (verified exactly)") {
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", 64,
      threshold = 0.45, bitsPerBand = 3, numBands = 10)
    val got = pairs.collect()
    got.foreach(r => assert(r.getAs[Double]("cos") >= 0.45))
  }
}
