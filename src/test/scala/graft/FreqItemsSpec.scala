package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.FreqItemsAggregate.freq_items
import graft.functions.TextFunctions
import graft.operators.Splits

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def hh(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(freq_items(col("item"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .as[(String, Long, Long)].collect()

  test("exact when capacity exceeds distinct count, across partitions") {
    val items = (1 to 500).map(i => s"w${i % 7}")
    val df = items.toDF("item").repartition(13)
    val got = hh(df, 16)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.forall(_._3 == 0L), "no decrement should ever fire")
    assert(got.map(e => e._1 -> e._2).toMap == truth)
    // sorted cnt desc, item asc
    assert(got.map(e => (-e._2, e._1)).sorted.sameElements(
      got.map(e => (-e._2, e._1))))
  }

  test("MG guarantee under pressure: heavy item kept, undercount <= err <= n/(cap+1)") {
    // 1 heavy item (40%), long tail of singletons, tiny capacity
    val heavy = Seq.fill(400)("HEAVY")
    val tail = (1 to 600).map(i => s"t$i")
    val n = heavy.size + tail.size
    val df = scala.util.Random.shuffle(heavy ++ tail).toDF("item")
      .repartition(7)
    val cap = 9
    val got = hh(df, cap)
    assert(got.length <= cap)
    val err = got.head._3
    assert(err <= n.toLong / (cap + 1) + 1,
      s"err $err exceeds MG bound ${n / (cap + 1)}")
    val h = got.find(_._1 == "HEAVY")
    assert(h.isDefined, "an item with freq >> n/(cap+1) must survive")
    // reported count is a lower bound within err of the truth
    assert(h.get._2 <= 400L && h.get._2 + err >= 400L)
  }

  test("works in groupBy and from the SQL surface") {
    graft.functions.SqlFunctions.register(spark)
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "item")
    df.createOrReplaceTempView("fi_in")
    val sql = spark.sql(
      "SELECT g, freq_items(item, 4) AS hh FROM fi_in GROUP BY g")
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.item"), col("e.cnt"))
      .as[(String, String, Long)].collect().toSet
    assert(sql == Set(("a", "x", 2L), ("a", "y", 1L), ("b", "z", 1L)))
  }

  test("non-string item types and analysis-time type errors") {
    val longs = Seq(1L, 1L, 2L).toDF("item")
    val got = longs.agg(freq_items(col("item"), 4).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.item"), col("e.cnt"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 1L)))
    val bad = intercept[Exception] {
      Seq(Array(1)).toDF("item").agg(freq_items(col("item"), 4)).collect()
    }
    assert(bad.getMessage.contains("freq_items"))
  }
}

class MixCapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("mixTemperature keeps all of the smallest group, flattens skew, deterministic") {
    val out = Splits.mixTemperature(docs, "lang", "doc_id", "s42")
    val in = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val minLang = in.minBy(_._2)._1
    assert(kept(minLang) == in(minLang), "rate for the smallest group is 1.0")
    // expected kept ≈ sqrt(n_min * n_g): within 4 sd of binomial
    in.foreach { case (g, ng) =>
      val exp = math.sqrt(in(minLang).toDouble * ng)
      val sd = math.sqrt(exp * math.max(0.0, 1 - exp / ng)) + 1
      assert(math.abs(kept.getOrElse(g, 0L) - exp) <= 4 * sd + 2,
        s"group $g kept ${kept.getOrElse(g, 0L)}, expected ~$exp")
    }
    // pure function of (id, salt, counts): re-partitioned rerun identical
    val out2 = Splits.mixTemperature(docs.repartition(11), "lang", "doc_id", "s42")
    assert(out.select("doc_id").except(out2.select("doc_id")).isEmpty &&
      out2.select("doc_id").except(out.select("doc_id")).isEmpty)
    // alpha = 1 keeps everything
    val all = Splits.mixTemperature(docs, "lang", "doc_id", "s42", alpha = 1.0)
    assert(all.count() == docs.count())
  }

  test("mixTemperature: a null group is a group, not silently dropped") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, Some("a")), (4L, Some("a")),
      (5L, None), (6L, None))
      .toDF("id", "g")
    val out = Splits.mixTemperature(df, "g", "id", "s42")
    // null group is the smallest (n=2) → rate 1.0 → both rows kept
    assert(out.filter(col("g").isNull).count() == 2)
    assert(out.count() >= 2 && out.count() <= 6)
  }

  test("capPerGroup == row_number form, survivors are real rows") {
    import org.apache.spark.sql.expressions.Window
    val k = 7
    val got = Splits.capPerGroup(docs, "lang", "doc_id", k, "s42")
    val h = Splits.hash48(col("doc_id"), "s42")
    val want = docs.withColumn("rn",
        row_number().over(Window.partitionBy("lang").orderBy(h, col("doc_id"))))
      .filter(col("rn") <= k).drop("rn")
    assert(got.schema == docs.schema)
    assert(got.select("doc_id").except(want.select("doc_id")).isEmpty &&
      want.select("doc_id").except(got.select("doc_id")).isEmpty)
    assert(got.groupBy("lang").count().as[(String, Long)].collect()
      .forall(_._2 <= k))
  }

  test("corpusFreqStats matches a local brute-force computation") {
    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
    val toks = local.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val tf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val want = toks.map { case (id, ts) =>
      (id, ts.size.toLong, ts.map(tf).sum) }.toSet
    val got = TextFunctions.corpusFreqStats(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }
}
