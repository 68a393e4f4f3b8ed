package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def docs = Tables.table(spark, sf, "documents")

  test("exact dedup collapses planted duplicates, keeps min id") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a  b   c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val groups = Dedup.exact(df, "doc_id", "text").collect()
    // whitespace-normalized: docs 1 and 2 collide
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("n_dups") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
    assert(Dedup.exactKept(df, "doc_id", "text").count() == 2)
  }

  test("bucket caps run as aggregates, not a single-task window") {
    // a flooded LSH bucket under count().over(partitionBy(bucket)) lands
    // in ONE window task (a straggler); the groupBy+anti-join form
    // partial-counts map-side. Assert the plan shape for both dedup paths.
    for (df <- Seq(
      Dedup.minhashPairs(docs, "doc_id", "text", jaccardThreshold = 0.8),
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), plan.linesIterator.take(30).mkString("\n"))
    }
  }

  test("minhash pairs match brute-force jaccard at threshold 0.8") {
    // brute force over sf0.001's 500 docs
    val sh = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions
        .wordShingles(col("text"), 3)).as("sh"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
         size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("j"))
      .filter(col("j") >= 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 128, bands = 32, jaccardThreshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"minhash=${lsh.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture should contain planted near-dups")
  }

  test("simhash hamming distance small for near-identical docs") {
    import spark.implicits._
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val variant = base.replace("tok100", "changed")
    val far = (1 to 200).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, variant), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("ngram jaccard finds the same planted near-dups as minhash (high thr)") {
    val ng = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 5, anchors = 4, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ng.nonEmpty)
  }

  test("ngram anchor buckets are capped: no raw self-join, audit reports drops") {
    // capped path (default cap) == effectively-uncapped path on a corpus
    // with no hot anchors — the cap changes nothing when no bucket fills
    val pairs = (cap: Int) => Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 5, anchors = 4, threshold = 0.8, maxBucketSize = cap)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(1000) == pairs(1000000))
    assert(Dedup.ngramDroppedAnchors(docs, "doc_id", "text",
      n = 5, anchors = 4, maxBucketSize = 1000).count() == 0)

    // a hot anchor (shared boilerplate prefix) floods one bucket: the
    // capped path drops it whole and the audit reports exactly that
    import spark.implicits._
    val boiler = "copyright header boilerplate repeated " * 3
    val hot = (1L to 30L).map(i => (i, boiler + s" unique tail $i _$i"))
      .toDF("doc_id", "text")
    assert(Dedup.ngramDroppedAnchors(hot, "doc_id", "text",
      n = 5, anchors = 4, maxBucketSize = 10).count() > 0)
    // and the candidate join stays bounded: with the cap no pair survives
    // a flooded anchor unless another (uncrowded) anchor also links it
    val capped = Dedup.ngramJaccardPairs(hot, "doc_id", "text",
      n = 5, anchors = 4, threshold = 0.0, maxBucketSize = 10).count()
    val uncapped = Dedup.ngramJaccardPairs(hot, "doc_id", "text",
      n = 5, anchors = 4, threshold = 0.0, maxBucketSize = 1000).count()
    assert(capped < uncapped, s"capped=$capped uncapped=$uncapped")

    // plan shape: candidate generation is an aggregate, never a window
    val plan = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  private def bruteJaccard(df: org.apache.spark.sql.DataFrame,
      tNum: Int, tDen: Int): Set[(Long, Long)] = {
    val tk = df.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions.tokens(col("text")))
        .as("toks"))
      .filter(size(col("toks")) > 0)
    tk.as("a").join(tk.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(array_intersect(col("a.toks"), col("b.toks"))).as("inter"),
        (size(col("a.toks")) + size(col("b.toks"))).as("szsum"))
      .filter(col("inter") * tDen >= (col("szsum") - col("inter")) * tNum)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("prefix-filter jaccard join is EXACT: equals brute force on fixture") {
    val exact = Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 1, 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = bruteJaccard(docs, 1, 2)
    assert(exact == brute, s"prefix=${exact.size} brute=${brute.size}")
    assert(brute.nonEmpty, "fixture should contain near-dup token sets")
  }

  test("prefix-filter join in shingle mode == brute-force shingle jaccard") {
    val sh = docs.select(col("doc_id"),
      array_distinct(graft.functions.TextFunctions
        .wordShingles(col("text"), 3)).as("s"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(array_intersect(col("a.s"), col("b.s"))).as("inter"),
        (size(col("a.s")) + size(col("b.s"))).as("szsum"))
      .filter(col("inter") * 2 >= col("szsum") - col("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 1, 2,
        shingleK = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"prefix=${got.size} brute=${brute.size}")
    assert(brute.nonEmpty)
  }

  test("prefix-filter join: rational threshold survives the double-ceil trap") {
    import spark.implicits._
    // 5-token docs at t = 4/5: ceil(0.8 * 5) in doubles is ceil(4.0000…01)
    // = 5, which would shrink the prefix to 1 token and can miss pairs.
    // The integer form ceil(4*5/5) = 4 keeps prefix length 2. Construct a
    // pair whose ONLY shared prefix token is the 2nd-rarest of each doc.
    val d1 = (1L, "common1 common2 common3 common4 rare_a")
    val d2 = (2L, "common1 common2 common3 common4 rare_b")
    // jaccard(d1, d2) = 4/6 < 4/5 — not a pair; add a true 4/5 pair:
    // x = {a b c d e}, y = {a b c d e} minus e plus ... need |∩|/|∪| >= 4/5
    // with 5-token sets: identical (5/5) or 4 shared of 5+5 → 4/6. So use
    // sets of size 4 and 5 sharing 4: 4/5 exactly.
    val d3 = (3L, "w1 w2 w3 w4 w5")
    val d4 = (4L, "w1 w2 w3 w4")
    val df = Seq(d1, d2, d3, d4).toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixPairs(df, "doc_id", "text", 4, 5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 4L)), got.toString)
    assert(got == bruteJaccard(df, 4, 5))
  }

  test("prefix-filter join == brute force across the threshold range") {
    import spark.implicits._
    // seeded corpus with planted near-dup chains: base docs plus mutated
    // copies at varying edit fractions, so every threshold separates a
    // different pair subset — equality must hold at each
    val rnd = new scala.util.Random(42)
    val base = (1 to 30).map { i =>
      (0 until 15).map(j => s"w${rnd.nextInt(60)}_$j").mkString(" ")
    }
    val docs = base.zipWithIndex.flatMap { case (t, i) =>
      val toks = t.split(" ")
      val light = toks.updated(3, "mutA").mkString(" ")
      val heavy = toks.zipWithIndex
        .map { case (w, j) => if (j % 3 == 0) s"mut$j" else w }.mkString(" ")
      Seq((i * 3L + 1, t), (i * 3L + 2, light), (i * 3L + 3, heavy))
    }.toDF("doc_id", "text").localCheckpoint(true)
    try {
      for ((tn, td) <- Seq((1, 2), (2, 3), (3, 4), (4, 5), (9, 10), (1, 1))) {
        val got = Dedup.jaccardPrefixPairs(docs, "doc_id", "text", tn, td)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val brute = bruteJaccard(docs, tn, td)
        assert(got == brute,
          s"t=$tn/$td prefix=${got.size} brute=${brute.size} " +
            s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
      }
    } finally docs.unpersist()
  }

  test("prefix-filter join: edge cases (identical, empty, disjoint) + plan") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha  beta   gamma"), // identical sets
      (3L, "   "), (4L, ""),                                 // empty
      (5L, "delta epsilon zeta")                             // disjoint
    ).toDF("doc_id", "text")
    val rows = Dedup.jaccardPrefixPairs(df, "doc_id", "text", 1, 2).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 2L)
    assert(rows.head.getDouble(2) == 1.0)
    // exactness on a larger random-ish corpus with planted dups
    val corpus = (1L to 120L).map { i =>
      val base = (0 until 12).map(j => s"t${(i * 7 + j * 13) % 40}")
      (i, base.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixPairs(corpus, "doc_id", "text", 1, 2)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bruteJaccard(corpus, 1, 2))
    // never a cartesian, never a window: candidates flow through the
    // prefix-token equi-join only
    val plan = Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 1, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      plan.linesIterator.take(25).mkString("\n"))
  }

  test("clusterKeepBest is id-type-agnostic: string ids keep highest " +
      "score, ties to the LEXICOGRAPHICALLY smallest id") {
    import spark.implicits._
    // docs a/b near-dup (identical text), c singleton; b outscores a.
    // The negation rides the numeric SCORE, so string ids must work
    // (the old max(struct(score, -id)) form was an analysis error here).
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog again", 0.2),
      ("b", "the quick brown fox jumps over the lazy dog again", 0.9),
      ("c", "completely different text with no shared shingles at all", 0.5)
    ).toDF("doc_id", "text", "score")
    val kept = Dedup.clusterKeepBest(df, "doc_id", "text", "score")
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("b", "c"), kept.toString)
    // tie on score → smaller id survives
    val tied = Seq(
      ("y", "the quick brown fox jumps over the lazy dog again", 0.7),
      ("x", "the quick brown fox jumps over the lazy dog again", 0.7)
    ).toDF("doc_id", "text", "score")
    val keptTie = Dedup.clusterKeepBest(tied, "doc_id", "text", "score")
      .select("doc_id").as[String].collect().toSet
    assert(keptTie == Set("x"), keptTie.toString)
  }
}
