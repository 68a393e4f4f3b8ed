package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, Transforms}
import graft.operators.{AsOf, Dedup, Similarity, Skew}

/** Regressions for the code-review findings (ANSI-mode casts, as-of null
  * carry, zero-norm cosine, null text, simhash banding bound). */
class ReviewRegressionSpec extends SparkSpec {

  test("skip drops unparsable numeric strings instead of throwing (ANSI)") {
    import spark.implicits._
    val df = Seq("10", "n/a", "30", "").toDF("v")
    val kept = Transforms.skip("v", ">", "5")(df).collect().map(_.getString(0))
    assert(kept.toSeq == Seq("10", "30"))
  }

  test("asof join never stitches values from different right rows") {
    import spark.implicits._
    val left = Seq((1L, 3L)).toDF("k", "ts")
    val right = Seq(
      (1L, 1L, Option("bid1"), Option("ask1")),
      (1L, 2L, None: Option[String], Option("ask2"))
    ).toDF("k", "ts", "bid", "ask")
    val out = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts",
        Map("bid" -> "bid", "ask" -> "ask")).collect()(0)
    // newest right row (ts=2) has bid=NULL; per-column carry would
    // resurrect bid1 from ts=1
    assert(out.isNullAt(out.fieldIndex("bid")))
    assert(out.getAs[String]("ask") == "ask2")
  }

  test("cosine with zero-norm vectors yields null, not DIVIDE_BY_ZERO") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f)), // zero vector
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 1)
    val out = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 2)
      .collect()
    // zero vector ranks last (null sim), real neighbor first
    assert(out.head.getAs[Long]("corpus_id") == 3L)
  }

  test("null text classifies as 'und' and yields zero counts") {
    import spark.implicits._
    val df = Seq(Option("the cat of a dog"), None).toDF("text")
    val lang = TextFunctions.langIdStaged(df, "text", "l")
      .select("l").collect().map(_.getString(0))
    assert(lang.toSeq == Seq("en", "und"))
    val stats = df.select(TextFunctions.qualityStats(col("text")): _*)
      .collect()(1)
    assert(stats.getAs[Long]("n_chars") == 0L)
    assert(stats.getAs[Long]("n_tokens") == 0L)
  }

  test("simhash banding keeps total recall at maxHamming up to 6") {
    import spark.implicits._
    val base = (1 to 300).map(i => s"w$i").mkString(" ")
    // flip several tokens -> a handful of differing bits
    val variant = base.replace("w10", "x").replace("w200", "y")
      .replace("w77", "z")
    val df = Seq((1L, base), (2L, variant)).toDF("doc_id", "text")
    val hamming = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 15)
      .collect().headOption
      .map(_.getAs[Number]("hamming").longValue)
    hamming.foreach { h =>
      if (h <= 6) {
        val found = Dedup.simhashPairs(df, "doc_id", "text",
          maxHamming = 6).count()
        assert(found == 1, s"pair at hamming $h missed with maxHamming=6")
      }
    }
  }

  test("asof join (composed + exec) never matches NULL timestamps") {
    import spark.implicits._
    val left = Seq(
      (1L, Option(5L)),   // real ts: only the ts=3 right row qualifies
      (1L, None: Option[Long]), // null ts: matches nothing
      (2L, Option(9L))    // key whose only right rows have null ts
    ).toDF("k", "ts")
    val right = Seq(
      (1L, None: Option[Long], "carried-null"), // must never be carried
      (1L, Option(3L), "ok"),
      (2L, None: Option[Long], "null-only")
    ).toDF("k", "ts", "v")
    for (impl <- Seq(AsOf.asofJoin _, graft.plans.AsOfJoin.asofJoin _)) {
      val rows = impl(left, right, Seq("k"), "ts", "ts", Map("v" -> "v"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          Option(r.getAs[String]("v")))).toSet
      assert(rows == Set(
        (1L, Some(5L), Some("ok")),
        (1L, None, None),
        (2L, Some(9L), None)), s"got $rows")
    }
  }

  test("minhashDroppedBuckets reports exactly what the cap drops") {
    import spark.implicits._
    // 8 identical docs flood every band bucket past a cap of 4
    val df = (1L to 8L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val dropped = Dedup.minhashDroppedBuckets(df, "doc_id", "text",
      maxBucketSize = 4)
    assert(dropped.count() > 0)
    assert(dropped.select(min(col("bucket_n"))).collect()(0).getLong(0) > 4)
    // with the cap the flood yields no pairs; uncapped it does
    assert(Dedup.minhashPairs(df, "doc_id", "text", maxBucketSize = 4)
      .count() == 0)
    assert(Dedup.minhashPairs(df, "doc_id", "text", maxBucketSize = 1000)
      .count() > 0)
  }

  test("RowUdf.toMsgs handles envelope-only frames (zero doc columns)") {
    import spark.implicits._
    val df = Seq(("insert", 1L, "db.t")).toDF("op", "ts", "ns")
    val msgs = graft.functions.RowUdf.toMsgs(df).collect()
    assert(msgs.length == 1 && msgs(0).doc.isEmpty)
  }

  test("saltedJoin rejects right-preserving join types") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "k", joinType = "full")
    }
  }
}
