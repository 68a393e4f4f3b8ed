package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** CCNet-style LM-perplexity quality filtering (Wenzek et al., LREC
  * 2020): score every document by its negative log-likelihood under a
  * language model trained on a TARGET (high-quality) corpus, and drop
  * the high-perplexity tail. CCNet uses a 5-gram KenLM; this operator
  * uses a hashed BIGRAM LM with add-α smoothing — the same filter
  * shape (documented divergence: hashed bigrams, not word 5-grams),
  * and unlike the unigram DSIR ratio it is sensitive to token ORDER: a
  * scrambled document keeps its unigram profile but loses its bigram
  * structure and scores visibly worse (asserted in the spec).
  *
  * Scale shape: LM training is one dim-bounded count aggregate over the
  * target corpus (map-side combined); the log-prob table is
  * driver-built from exact integer counts and ships as a dim-element
  * literal; scoring is (doc, bucket, cnt) rows → one exact BIGINT sum
  * per doc — linear in corpus tokens, nothing dim × corpus.
  *
  * Deterministic BY CONSTRUCTION: counts are exact integers, the grid
  * is floor(1e9·log p̂) per bucket computed once driver-side, each
  * doc's NLL is an exact BIGINT dot product, and the reported
  * per-token average is exact integer division — bit-identical under
  * any partition layout, pinnable cross-run.
  */
object NgramLm {

  /** (idCol, bucket, cnt): hashed bigram counts — adjacent token pairs
    * joined with a 0x1f separator, murmur3 → `dim` buckets. Docs with
    * fewer than 2 tokens contribute no rows. */
  def hashedBigramCounts(docs: DataFrame, idCol: String, textCol: String,
                         dim: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val grams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit("\u001f"), b))
    docs.select(col(idCol), explode(grams).as("__g"))
      .groupBy(col(idCol), pmod(hash(col("__g")), lit(dim)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-bucket floor(1e9 · log p̂(j)) with add-α smoothing — the
    * driver-built LM table. */
  private[graft] def logProbGrid(counts: Array[Long],
                                 alpha: Double): Array[Long] = {
    val dim = counts.length
    val tot = counts.sum.toDouble + alpha * dim
    Array.tabulate(dim)(j =>
      math.floor(math.log((counts(j) + alpha) / tot) * 1e9).toLong)
  }

  private def bucketTotals(counts: DataFrame, dim: Int): Array[Long] = {
    val a = new Array[Long](dim)
    counts.groupBy("bucket").agg(sum("cnt").as("c")).collect()
      .foreach(r => a(r.getInt(0)) = r.getLong(1))
    a
  }

  /** (idCol, n_grams, nll9_avg): per-doc bigram count and exact-grid
    * average negative log-likelihood under the target LM —
    * floor-division of the exact BIGINT NLL sum by the gram count
    * (higher = more perplexing = worse). Docs with < 2 tokens score
    * (0, 0) — no evidence either way, callers gate on length
    * separately. */
  def perplexityScores(raw: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, dim: Int,
                       alpha: Double = 1.0): DataFrame = {
    val grid = logProbGrid(
      bucketTotals(hashedBigramCounts(target, idCol, textCol, dim), dim),
      alpha)
    val gridCol: Column = lit(grid)
    val summed = hashedBigramCounts(raw, idCol, textCol, dim)
      .groupBy(idCol)
      .agg(sum("cnt").as("n_grams"),
        sum(col("cnt") * -element_at(gridCol, col("bucket") + 1))
          .as("nll9"))
    raw.select(col(idCol)).join(summed, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(floor(col("nll9") / col("n_grams")).cast("bigint"),
          lit(0L)).as("nll9_avg"))
  }

  /** The `k` most perplexing raw docs under the target LM (desc
    * average NLL, ties by id) — the drop candidates. Bounded top-k
    * (TakeOrderedAndProject), never a global sort. */
  def worst(raw: DataFrame, target: DataFrame, idCol: String,
            textCol: String, dim: Int, k: Int,
            alpha: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = perplexityScores(raw, target, idCol, textCol, dim, alpha)
      .filter(col("n_grams") > 0)
    val topk = scored.orderBy(desc("nll9_avg"), col(idCol)).limit(k)
    topk.withColumn("rank",
        row_number().over(Window.orderBy(desc("nll9_avg"), col(idCol))))
      .select(col(idCol), col("rank").cast("int").as("rank"),
        col("n_grams"), col("nll9_avg"))
  }
}
