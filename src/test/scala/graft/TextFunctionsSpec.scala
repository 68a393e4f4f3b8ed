package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.expressions.{MinHashSignature, SimHash64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

class TextFunctionsSpec extends SparkSpec {

  test("tokens/shingles/ngrams edge cases") {
    import spark.implicits._
    val df = Seq("a b c d", "  x  ", "", "one").toDF("text")
    val out = df.select(
      tokenCount(col("text")).as("n"),
      wordShingles(col("text"), 3).as("sh"),
      charNgrams(col("text"), 3).as("ng")).collect()
    assert(out(0).getAs[Int]("n") == 4)
    assert(out(0).getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("a b c", "b c d"))
    assert(out(1).getAs[Int]("n") == 1)
    assert(out(2).getAs[Int]("n") == 0)
    assert(out(3).getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("one"))
    assert(out(3).getAs[scala.collection.Seq[String]]("ng").toSeq == Seq("one"))
    assert(out(0).getAs[scala.collection.Seq[String]]("ng").head == "a b")
  }

  test("langId picks the language with most marker words") {
    import spark.implicits._
    val df = Seq(
      "the cat of the house and a dog",
      "el perro y la casa de los gatos",
      "der hund und die katze ist von mir",
      "zzz qqq www").toDF("text")
    val got = df.select(langIdHeuristic(col("text")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "es", "de", "und"))
  }

  test("codegen and interpreted paths agree for MinHashSignature/SimHash64") {
    // df path runs whole-stage codegen; nullSafeEval is the interpreted path
    import spark.implicits._
    val texts = Seq("a b c d e f g", "lorem ipsum dolor sit amet", "x")
    val df = texts.toDF("text")
    val viaCodegen = df.select(
      graft.functions.expressions.HashExpressions
        .minhash_signature(tokens(col("text")), 16).as("sig"),
      graft.functions.expressions.HashExpressions
        .simhash64(tokens(col("text"))).as("sh"))
      .collect()
    texts.zip(viaCodegen).foreach { case (t, row) =>
      val arr = new GenericArrayData(
        t.trim.split("\\s+").map(UTF8String.fromString(_)))
      val sigEval = MinHashSignature(null, 16).nullSafeEval(arr)
        .asInstanceOf[ArrayData].toLongArray.toSeq
      val shEval = SimHash64(null).nullSafeEval(arr).asInstanceOf[Long]
      assert(row.getAs[scala.collection.Seq[Long]]("sig").toSeq == sigEval)
      assert(row.getAs[Long]("sh") == shEval)
    }
  }

  test("c4 line filter: every rule fires; kept lines preserve order") {
    import spark.implicits._
    val doc = Seq(
      "A good first sentence with plenty of words here.",
      "Short one.",                                   // < 5 words
      "No terminal punctuation on this line at all",  // no . ! ? "
      "Lorem Ipsum dolor sit amet is classic filler.",// lorem ipsum
      "A code sample { inline } still ends well.",    // brace
      "\"Quoted lines count as terminated too\"",     // quote terminal
      "The closing sentence also survives the cut!").mkString("\n")
    val kept = Seq(doc).toDF("text")
      .select(graft.functions.TextFunctions.c4CleanLines(col("text"))
        .as("kept"))
      .head.getSeq[String](0)
    assert(kept == Seq(
      "A good first sentence with plenty of words here.",
      "\"Quoted lines count as terminated too\"",
      "The closing sentence also survives the cut!"))
  }

  test("fingerprint is whitespace-insensitive") {
    import spark.implicits._
    val df = Seq(("a b  c"), ("a b c"), ("a b d")).toDF("text")
    val fps = df.select(fingerprintMd5(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("gopher rules: each rule can individually kill a doc; null/empty safe") {
    import spark.implicits._
    val okBody = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the of and that" // 64 words, all alpha, 4 stop kinds
    val docs = Seq(
      1L -> okBody,                                    // passes all rules
      2L -> "too short the of",                        // rule 1: < 50 words
      3L -> ((1 to 60).map(_ => "ab").mkString(" ") + " the of"),  // rule 2: mean < 3
      4L -> (okBody + " " + (1 to 10).map(_ => "#").mkString(" ")), // rule 3: symbols
      5L -> (okBody.split(" ").map("- " + _).mkString("\n")),       // rule 4: bullets
      6L -> (okBody.split(" ").map(_ + " ...").mkString("\n")),     // rule 5: ellipses
      7L -> (okBody + " " + (1 to 20).map(_.toString).mkString(" ")), // rule 6: digits
      8L -> (1 to 60).map(i => s"word$i").mkString(" "), // rule 7: no stop words
      9L -> "",                                        // empty: rule 1
      10L -> null.asInstanceOf[String]                 // null: safe, rule 1
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id") +: gopherSignals(col("text")): _*)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.length - 1)).toMap
    assert(got(1L), "clean doc must pass")
    (2L to 10L).foreach(id => assert(!got(id), s"doc $id must fail"))
  }

  test("repetition signals: hand-computed counts; each rule kills; edge cases") {
    import spark.implicits._
    val docs = Seq(
      // no repetition: 18 distinct 1-char words on 2 lines — every
      // bigram distinct (mass 2·1=2, 2·5=10 ≤ 18 nonspace chars)
      1L -> "a b c d e f g h i j k l\nm n o p q r",
      // duplicate line: 3 lines, 2 dup ("x y" twice) -> 2/3 > 30%
      2L -> "x y\nx y\nalpha beta gamma delta epsilon",
      // dominant bigram: "no no" count 5, mass 5*4=20 vs n_nonspace 19
      3L -> "no no no no no no unique1",
      4L -> "",
      5L -> null.asInstanceOf[String]
    ).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions
      .repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap

    val d1 = got(1L)
    assert((d1.getLong(2), d1.getLong(3)) == (2L, 0L)) // n_lines, dup
    assert(d1.getLong(7) == 17L && d1.getBoolean(8))   // n_bigrams, keep
    val d2 = got(2L)
    assert((d2.getLong(2), d2.getLong(3)) == (3L, 2L))
    assert(d2.getLong(5) == 6L)                        // dup chars 2*3
    assert(!d2.getBoolean(8), "dup-line fraction must kill doc 2")
    val d3 = got(3L)
    assert(d3.getLong(6) == 20L, "top bigram mass 'no no' x5 x4 chars")
    assert(!d3.getBoolean(8), "bigram mass 20*5 > 22 nonspace")
    // empty/null: 1 empty line, zero bigrams, zero masses -> keep
    Seq(4L, 5L).foreach { id =>
      val d = got(id)
      assert(d.getLong(1) == 0L && d.getLong(6) == 0L &&
        d.getLong(7) == 0L && d.getBoolean(8), s"doc $id")
    }
  }
}
