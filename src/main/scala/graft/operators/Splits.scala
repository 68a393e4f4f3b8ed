package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expressions.TopKAggregate.top_k_by

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Everything keys off md5 of the row id + a salt, NOT `rand()`: split
  * membership must be a pure function of the row so that (a) re-runs and
  * retried tasks agree, (b) a row keeps its split across incremental
  * ingests, and (c) an external system (or the DuckDB oracle) can
  * recompute the assignment bit-for-bit. md5 rather than xxhash64
  * because it is the one hash both engines share.
  *
  * Scale: both operators are single-pass Column algebra; the stratified
  * sample's per-group top-k runs on the bounded-heap aggregate (O(k)
  * state per group, map-side partial combine) — NOT a row_number window,
  * which would funnel every row of a group through one task.
  */
object Splits {

  /** 48-bit uniform hash of (id, salt): the first 12 hex chars of the
    * md5, as a bigint. 48 bits keeps the value exactly representable as
    * a double (needed by the sampling heap's score) while making ties
    * across a realistic corpus essentially impossible. */
  def hash48(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 12), 16, 10)
      .cast("bigint")

  /** Percentile bucket in [0, 100). */
  def pct(id: Column, salt: String): Column = hash48(id, salt) % 100

  /** Assign each row to a named split by hash percentile. `splits` maps
    * name → percent; must sum to 100. Assignment is stable under
    * re-partitioning, re-runs, and incremental appends. */
  def assign(df: DataFrame, idCol: String, salt: String,
      splits: Seq[(String, Int)] =
        Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
    val p = pct(col(idCol), salt)
    val cumulative = splits.scanLeft(0)(_ + _._2).tail
    val split = splits.zip(cumulative).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cum)) =>
        when(acc.isNotNull, acc).otherwise(when(p < cum, lit(name)))
    }
    df.withColumn("split_pct", p).withColumn("split", split)
  }

  /** Materialize a corpus as deterministically SHUFFLED training shards:
    * shard = hash48(id) % numShards, rows within each shard ordered by
    * (hash48, id). The global order is a pure function of (ids, salt) —
    * the same corpus always produces byte-identical shards, so a resumed
    * or re-run training job sees the same sample order (which `rand()`
    * or `repartition`-order shuffling cannot promise).
    *
    * Plan shape: one hash-partition shuffle on `shard` (each shard lands
    * wholly in one task) + in-task sort, then a partitionBy writer that
    * emits exactly one file per non-empty shard. No global sort, no
    * driver involvement; 100 TB into 10k shards is 10k independent
    * sorted streams. */
  def writeShuffledShards(df: DataFrame, idCol: String, dir: String,
      numShards: Int, salt: String): Unit = {
    require(numShards > 0, "numShards must be > 0")
    val h = hash48(col(idCol), salt)
    df.withColumn("shard", (h % numShards).cast("int"))
      .withColumn("__h", h)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.partitionBy("shard").mode("overwrite").parquet(dir)
  }

  /** Offset-based sequence packing: lay documents end-to-end (in the
    * deterministic shuffled-shard order) and assign each a (shard,
    * start_offset, bin) under a per-bin token budget — the step that
    * turns a curated corpus into fixed-length training examples. A doc's
    * bin is where its first token lands; boundary-straddling policy
    * (truncate/wrap) is the consumer's, the assignment is what must be
    * reproducible.
    *
    * Shape: the running sum is a window per SHARD — parallelism =
    * numShards independent single-pass tasks (size each shard to
    * executor memory via numShards), never one global window. */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
      maxTokens: Int, numShards: Int, salt: String): DataFrame = {
    require(maxTokens > 0 && numShards > 0, "maxTokens/numShards must be > 0")
    val h = hash48(col(idCol), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), tokenCount.cast("bigint").as("n_tokens"),
        h.as("__h"), (h % numShards).cast("int").as("shard"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .withColumn("bin", expr(s"start_offset DIV $maxTokens"))
      .select(col(idCol), col("shard"), col("n_tokens"),
        col("start_offset"), col("bin"))
  }

  /** Temperature-weighted source mixing (deterministic): downsample each
    * group so the kept-row distribution follows p_g^α instead of the raw
    * p_g — the standard multi-source LLM-corpus rebalance (α < 1 flattens
    * source skew; α = 1 keeps raw proportions). The smallest group keeps
    * rate 1.0 and larger groups keep rate (n_min/n_g)^(1-α).
    *
    * Membership is hash48-thresholded, never `rand()`: the kept set is a
    * pure function of (id, salt, group counts) — re-runs, retried tasks,
    * and an external auditor (the DuckDB oracle) reproduce it exactly.
    * For α = 0.5 the rate is computed with `sqrt` (IEEE-correctly-rounded
    * in every engine) so the threshold is bit-identical cross-engine.
    *
    * Shape: one partial-aggregated count per group + a broadcast join of
    * the tiny (group, rate) table — the corpus is scanned once, no
    * shuffle of the data rows. */
  def mixTemperature(df: DataFrame, groupCol: String, idCol: String,
      salt: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val minCount = counts.agg(min(col("__n")).as("__n_min"))
    val ratio = col("__n_min").cast("double") / col("__n").cast("double")
    val rate =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, 1.0 - alpha)
    val rates = counts.crossJoin(broadcast(minCount))
      .select(col(groupCol).as("__mix_g"), rate.as("__keep_rate"))
    // keep ⇔ hash48 < rate · 2^48 (2^48 is a power of two: the scale is
    // exact, so the comparison is deterministic across engines).
    // Null-safe join: a null group is still a group (groupBy counted it),
    // so its rows must reach the filter rather than vanish in the join.
    df.join(broadcast(rates), df(groupCol) <=> rates("__mix_g"))
      .filter(hash48(col(idCol), salt).cast("double") <
        col("__keep_rate") * lit(281474976710656.0))
      .drop("__mix_g", "__keep_rate")
  }

  /** Keep at most k rows per group (deterministic hash priority) — the
    * "max N documents per domain" curation cap. Survivors are the k
    * smallest (hash48, id) of each group, selected by the bounded-heap
    * aggregate and semi-joined back, so no row_number window ever
    * funnels a hot domain through one task. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: String): DataFrame =
    df.join(
      // the survivor-id list is ≤ k × #groups rows — broadcast it
      broadcast(stratifiedSample(df, groupCol, idCol, k, salt)
        .select(col(idCol))),
      Seq(idCol), "left_semi")

  /** Deterministic stratified sample: the k rows with the smallest
    * (hash48, id) per group. Emits (group, rank, id). One aggregation
    * pass; shuffle carries only k-bounded heaps per (partition, group).
    * Equivalent SQL: row_number() over (partition by group order by
    * hash, id) <= k — but without the single-task-per-group window. */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: String): DataFrame = {
    // top_k_by keeps the k best by (score desc, id asc): negating the
    // hash makes "best" = smallest hash, and equal hashes keep the
    // smaller id — matching the (hash, id) sort order exactly.
    val score = -hash48(col(idCol), salt).cast("double")
    df.groupBy(col(groupCol))
      .agg(top_k_by(score, col(idCol), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(groupCol), (col("pos") + 1).as("rank"),
        col("t.corpus_id").as(idCol))
  }

  /** WEIGHTED sample without replacement, k per group (A-ES:
    * Efraimidis & Spirakis 2006) — "sample documents proportional to
    * quality" where [[stratifiedSample]] treats every row equally. Each
    * row draws its deterministic uniform u = (hash48(id, salt)+1)/2^48
    * ∈ (0, 1] and competes on the exponential key ln(u)/w (the log-form
    * of u^(1/w): monotone-equivalent, overflow-free); the k largest keys
    * per group are exactly an A-ES weighted sample, selected by the same
    * k-bounded heap as the uniform path — one aggregation pass, no
    * window funnel, no per-group scan. Rows with weight ≤ 0 or null
    * cannot win and are filtered. Deterministic per salt (same JVM libm
    * everywhere — executors agree bit-for-bit), so the query surface is
    * pinnable; re-salt to redraw. */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, salt: String): DataFrame = {
    val u = (hash48(col(idCol), salt).cast("double") + lit(1.0)) /
      lit(281474976710656.0)
    val key = log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(groupCol))
      .agg(top_k_by(key, col(idCol), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(groupCol), (col("pos") + 1).as("rank"),
        col("t.corpus_id").as(idCol))
  }
}
