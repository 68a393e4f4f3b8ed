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
}
