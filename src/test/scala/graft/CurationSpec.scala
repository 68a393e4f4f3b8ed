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
