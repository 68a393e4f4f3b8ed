package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Decontaminate, Splits}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, IPs, and phones; order prevents half-eats") {
    val in = Seq(
      "mail me at jane.doe+x@sub.example.co.uk today",
      "server at 192.168.10.255 is down",
      "call +1 (555) 010-4477 or 555-123-4567",
      "mixed: a@b.io from 10.0.0.1 ring 5551234567",
      "no pii here at all").toDF("t")
    val out = in.select(TextFunctions.redactPii(col("t")).as("t"))
      .as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "server at <IP> is down")
    assert(out(2) == "call <PHONE> or <PHONE>")
    assert(out(3) == "mixed: <EMAIL> from <IP> ring <PHONE>")
    assert(out(4) == "no pii here at all")
  }

  test("split assignment is deterministic, complete, and ~proportional") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a1 = Splits.assign(docs, "doc_id", "s42").select("doc_id", "split")
    val a2 = Splits.assign(docs.repartition(7), "doc_id", "s42")
      .select("doc_id", "split")
    assert(a1.except(a2).isEmpty && a2.except(a1).isEmpty)
    val counts = a1.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    val n = docs.count().toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / n - 0.8) < 0.1)
    // a different salt reshuffles membership
    val b = Splits.assign(docs, "doc_id", "other").select("doc_id", "split")
    assert(a1.except(b).count() > 0)
    intercept[IllegalArgumentException] {
      Splits.assign(docs, "doc_id", "s", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("stratifiedSample == row_number window form, without the window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val k = 7
    val got = Splits.stratifiedSample(docs, "lang", "doc_id", k, "s42")
    val expected = docs
      .withColumn("h", Splits.hash48(col("doc_id"), "s42"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    // no group exceeds k
    assert(got.groupBy("lang").count().filter(col("count") > k).isEmpty)
  }

  test("weightedSample == A-ES row_number window form; weights steer inclusion") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val k = 7
    val got = Splits.weightedSample(docs, "lang", "doc_id", "n_chars",
      k, "s42")
    val u = (Splits.hash48(col("doc_id"), "s42").cast("double") + lit(1.0)) /
      lit(281474976710656.0)
    val expected = docs
      .filter(col("n_chars").isNotNull && col("n_chars") > 0)
      .withColumn("key", log(u) / col("n_chars").cast("double"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("key").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    assert(got.groupBy("lang").count().filter(col("count") > k).isEmpty)

    // weights matter: a 1000x-weight row wins a 2-slot sample in nearly
    // every redraw; a weight-1 row among 1000x peers almost never does
    import spark.implicits._
    val skew = (0L until 40L).map(i =>
      (i, if (i == 0) 100000L else 1L)).toDF("id", "w")
      .withColumn("g", lit("g"))
    val wins = (0 until 10).count { s =>
      Splits.weightedSample(skew, "g", "id", "w", k = 2, salt = s"r$s")
        .filter(col("id") === 0).count() == 1
    }
    assert(wins >= 9, s"heavy row sampled only $wins/10 redraws")

    // zero/negative/null weights never appear
    val bad = Seq((1L, 0L), (2L, -5L), (3L, 10L)).toDF("id", "w")
      .withColumn("g", lit("g"))
    val kept = Splits.weightedSample(bad, "g", "id", "w", 3, "s")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("shuffled shards: complete, hash-assigned, in-shard sorted, reproducible") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang")
    val d1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val d2 = java.nio.file.Files.createTempDirectory("shards2").toString
    Splits.writeShuffledShards(docs, "doc_id", d1, numShards = 8, salt = "s42")
    Splits.writeShuffledShards(docs, "doc_id", d2, numShards = 8, salt = "s42")

    val back = spark.read.parquet(d1)
    // complete: every row exactly once
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "lang").except(docs).isEmpty)
    // assignment matches the hash
    val wrong = back.filter(
      (Splits.hash48(col("doc_id"), "s42") % 8).cast("int") =!= col("shard"))
    assert(wrong.isEmpty)

    // one file per non-empty shard; rows inside ordered by (hash48, id)
    val shardDirs = new java.io.File(d1).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.nonEmpty)
    for (sd <- shardDirs) {
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
      val rows = spark.read.parquet(files.head.getAbsolutePath)
        .select("doc_id").as[Long].collect()
      // exact check: re-sort by the engine's own hash and compare order
      val hs = docs.filter(col("doc_id").isin(rows: _*))
        .select(col("doc_id"), Splits.hash48(col("doc_id"), "s42").as("h"))
        .orderBy("h", "doc_id").select("doc_id").as[Long].collect()
      assert(rows.toSeq == hs.toSeq, s"${sd.getName} not hash-ordered")
    }

    // byte-deterministic across runs: same per-shard sequences
    for (sd <- shardDirs) {
      val other = new java.io.File(d2, sd.getName)
      val a = spark.read.parquet(sd.getAbsolutePath).select("doc_id")
        .as[Long].collect().toSeq
      val b = spark.read.parquet(other.getAbsolutePath).select("doc_id")
        .as[Long].collect().toSeq
      assert(a == b)
    }
  }

  test("plan shapes: sample uses bounded-heap agg (no Window); decontaminate broadcasts eval") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val samplePlan = Splits.stratifiedSample(docs, "lang", "doc_id", 5, "s")
      .queryExecution.executedPlan.toString
    assert(samplePlan.contains("top_k_by"), samplePlan)
    assert(samplePlan.contains("ObjectHashAggregate"), samplePlan)
    assert(!samplePlan.contains("Window"), samplePlan)

    val deconPlan = Decontaminate.overlap(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", 8).queryExecution.executedPlan.toString
    // eval grams must reach the train scan as a broadcast, never a
    // sort-merge shuffle of the full train gram stream
    assert(deconPlan.contains("BroadcastHashJoin"), deconPlan)
    assert(!deconPlan.contains("SortMergeJoin"), deconPlan)
  }

  test("overlapBloom: superset of exact overlap, join-free plan, layout-stable") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val exact = Decontaminate.overlap(train, eval, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Decontaminate.overlapBloom(train, eval, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-sided error: every exact hit present, never undercounted
    exact.foreach { case (id, n) =>
      assert(bloomed.contains(id) && bloomed(id) >= n,
        s"doc $id: bloom ${bloomed.get(id)} < exact $n")
    }
    // false positives bounded: at the 1e-4 default the per-doc
    // compounded spurious rate stays ~0.5%
    val trainN = train.count()
    assert(bloomed.size - exact.size <= math.max(5L, trainN / 50),
      s"${bloomed.size - exact.size} spurious docs of $trainN")

    val plan = Decontaminate.overlapBloom(train, eval, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    assert(!plan.contains("Join"), plan) // a filter, not a join

    val relaid = Decontaminate.overlapBloom(train.repartition(13),
        eval.repartition(7), "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(relaid == bloomed)
  }

  test("property: decontaminate == naive shared-gram count on random docs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val doc = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val k = 3
    def gramsOf(text: String): Set[String] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val g = if (toks.isEmpty) Seq(text.trim)
        else if (toks.size <= k) Seq(toks.mkString(" "))
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      g.filter(_.nonEmpty).toSet
    }
    val gen = for {
      nT <- Gen.choose(1, 6); nE <- Gen.choose(1, 4)
      t <- Gen.listOfN(nT, doc); e <- Gen.listOfN(nE, doc)
    } yield (t, e)
    val prop = Prop.forAll(gen) { case (trainDocs, evalDocs) =>
      val train = trainDocs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val eval = evalDocs.zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val got = Decontaminate.overlap(train, eval, "doc_id", "text", k)
        .as[(Long, Long)].collect().toMap
      val evalGrams = evalDocs.flatMap(gramsOf).toSet
      val expected = trainDocs.zipWithIndex.flatMap { case (t, i) =>
        val n = gramsOf(t).count(evalGrams.contains)
        if (n > 0) Some(i.toLong -> n.toLong) else None
      }.toMap
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("packSequences: contiguous offsets per shard, bins respect budget") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = Splits.packSequences(docs, "doc_id",
      graft.functions.TextFunctions.bpeTokenCount(col("text")),
      maxTokens = 256, numShards = 4, salt = "s42")
    assert(packed.count() == docs.count())
    val rows = packed.orderBy("shard", "start_offset")
      .select("shard", "n_tokens", "start_offset", "bin")
      .as[(Int, Long, Long, Long)].collect()
    // per shard: offsets are the exact running sum (contiguous, no gaps)
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      var expected = 0L
      shardRows.foreach { case (_, n, off, bin) =>
        assert(off == expected, s"offset gap: $off vs $expected")
        assert(bin == off / 256)
        expected += n
      }
    }
    // deterministic under repartitioning
    val again = Splits.packSequences(docs.repartition(13), "doc_id",
      graft.functions.TextFunctions.bpeTokenCount(col("text")),
      maxTokens = 256, numShards = 4, salt = "s42")
    assert(packed.except(again).isEmpty && again.except(packed).isEmpty)
  }

  test("dedupSegments keeps first occurrences in order") {
    val out = TextFunctions.dedupSegmentsStaged(
      Seq((1L, "a\nb\na\nc\nb\na"), (2L, "x"), (3L, "")).toDF("id", "t"),
      "t", "clean", "\n")
      .orderBy("id").select("clean").as[String].collect()
    assert(out(0) == "a\nb\nc")
    assert(out(1) == "x")
    assert(out(2) == "")
  }

  test("decontaminate flags exactly the train docs sharing k-grams with eval") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"), // 3-gram overlap with eval 10
      (2L, "one two three four five"), // no overlap
      (3L, "x y z alpha beta gamma delta q") // overlap, different position
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta zeta"),
      (11L, "")).toDF("doc_id", "text")
    val out = Decontaminate.overlap(train, eval, "doc_id", "text", k = 3)
      .as[(Long, Long)].collect().toMap
    // doc 1: shares 3-grams "alpha beta gamma", "beta gamma delta" → 2 hits
    assert(out == Map(1L -> 2L, 3L -> 2L))
    // blank eval docs contribute nothing (empty grams filtered)
    val onlyBlank = Seq((11L, "   ")).toDF("doc_id", "text")
    assert(Decontaminate.overlap(train, onlyBlank, "doc_id", "text", 3).isEmpty)
  }
}
