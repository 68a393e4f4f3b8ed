package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination: find training documents that share word
  * n-grams with an evaluation set, so they can be dropped before
  * training (the standard "13-gram overlap" test-set-leak check, here
  * with configurable k).
  *
  * Shape at 100 TB: the eval side (benchmark suites) is tiny and is
  * broadcast after being reduced to DISTINCT n-gram hashes, so the train
  * corpus is scanned once, streams through a broadcast-hash semi-match,
  * and only matching (doc, gram) rows reach the final count shuffle.
  * Gram keys travel as md5 hashes (~16 B), never the gram text. Set
  * `broadcastEval = false` if the eval set is genuinely large — the join
  * falls back to a shuffle hash join on the same keys.
  */
object Decontaminate {

  /** (idCol, n_hits) for every train doc sharing at least one distinct
    * word k-gram with any eval doc; n_hits = number of distinct
    * contaminated k-grams in that doc. Empty grams (blank docs) are
    * ignored. */
  def overlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int, broadcastEval: Boolean = true): DataFrame = {
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
        .select(col(idCol),
          explode(array_distinct(
            TextFunctions.wordShinglesFromTokens(col("__toks"), k)))
            .as("gram"))
        .filter(length(col("gram")) > 0)
        .select(col(idCol), md5(col("gram")).as("gh"))

    val evalGrams = grams(eval).select("gh").distinct()
    val evalSide = if (broadcastEval) broadcast(evalGrams) else evalGrams
    grams(train)
      .join(evalSide, "gh")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Bloom-filter variant of [[overlap]] for when even the DISTINCT
    * eval gram-hash set is too large to broadcast as a join side: the
    * eval grams compress into a Bloom filter (~19 bits/item at the
    * 1e-4 default fpp vs 16-byte md5 keys — ~7× smaller than the
    * broadcast set, and NOT a join: the probe is a codegen'd filter expression inside the
    * train scan's whole-stage pipeline, so no shuffle and no hash
    * table). One-sided error: every truly-contaminated doc is reported
    * with AT LEAST its exact hit count (no false negatives — safe for
    * decontamination, which over-drops rather than leaks); false
    * positives add spurious grams at `fpp` per probed gram — which
    * COMPOUNDS per doc (a clean doc with g grams is spuriously flagged
    * with probability 1−(1−fpp)^g), hence the 1e-4 default: ~0.5% of
    * 50-gram docs spuriously dropped, vs ~40% at the classic 1%.
    * Bits are deterministic for a given item set (fixed seeds,
    * bitwise-OR merge — order-independent), so output is
    * layout-independent. */
  def overlapBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int, fpp: Double = 1e-4): DataFrame = {
    import graft.functions.expressions.BloomExpressions.bloom_might_contain
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
        .select(col(idCol),
          explode(array_distinct(
            TextFunctions.wordShinglesFromTokens(col("__toks"), k)))
            .as("gram"))
        .filter(length(col("gram")) > 0)
        .select(col(idCol), md5(col("gram")).as("gh"))
    val evalGrams = grams(eval).select("gh").distinct()
    val n = math.max(evalGrams.count(), 1L)
    val bloom = evalGrams.stat.bloomFilter("gh", n, fpp)
    grams(train)
      .filter(bloom_might_contain(col("gh"), bloom))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }
}
