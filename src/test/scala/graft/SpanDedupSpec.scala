package graft

import graft.operators.SpanDedup

/** Cross-doc duplicate-span removal semantics on a hand-computable
  * corpus: keeper retention, coverage union of overlapping spans,
  * sub-k-gram docs untouched, fully-duplicated docs emptied. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 4) =
    SpanDedup.removeDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1)

  test("keeper keeps the span; the later doc loses exactly the span") {
    val shared = "w1 w2 w3 w4" // one 4-gram
    val out = run(Seq(
      1L -> s"$shared alpha beta gamma delta",
      2L -> s"pre1 pre2 pre3 $shared"), k = 4)
    val (_, n1, d1, t1) = out(0)
    val (_, n2, d2, t2) = out(1)
    assert(n1 == 8 && d1 == 0 && t1 == s"$shared alpha beta gamma delta")
    assert(n2 == 7 && d2 == 4 && t2 == "pre1 pre2 pre3")
  }

  test("overlapping duplicate spans cover a union, not double-count") {
    // doc 2 repeats a 5-token run: two overlapping 4-grams, 5 covered
    val shared = "a b c d e"
    val out = run(Seq(1L -> s"$shared tail1", 2L -> s"$shared tail2"), k = 4)
    assert(out(0)._3 == 0)
    assert(out(1) == ((2L, 6L, 5L, "tail2")))
  }

  test("docs shorter than k never match; identical docs empty the later") {
    val out = run(Seq(
      1L -> "x y z",          // < k tokens: no grams
      2L -> "x y z",          // < k tokens even though identical
      3L -> "p q r s t",
      4L -> "p q r s t"), k = 4)
    assert(out(0) == ((1L, 3L, 0L, "x y z")))
    assert(out(1) == ((2L, 3L, 0L, "x y z")))
    assert(out(2) == ((3L, 5L, 0L, "p q r s t")))
    assert(out(3) == ((4L, 5L, 5L, "")))
  }

  test("null text is an empty doc, not a null row") {
    val docs = Seq((1L, "a b c d"), (2L, null: String), (3L, "a b c d x"))
      .toDF("doc_id", "text")
    val out = SpanDedup.removeDupSpans(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
    assert(out(1).getLong(1) == 1L) // split("") = [""] — one empty token
    assert(out(1).getLong(2) == 0L)
    assert(out(1).getString(3) == "")
    assert(out(2).getLong(2) == 4L) // the shared span still dedups
  }

  test("three-way duplication: one keeper, every other doc cleaned") {
    val s = "m n o p"
    val out = run(Seq(3L -> s"$s u3", 1L -> s"$s u1", 2L -> s"$s u2"), k = 4)
    assert(out(0) == ((1L, 5L, 0L, s"$s u1")))
    assert(out(1) == ((2L, 5L, 4L, "u2")))
    assert(out(2) == ((3L, 5L, 4L, "u3")))
  }

  test("fully-covered long doc: the gap-slice rebuild is linear, not quadratic") {
    // 40k tokens, every position covered (doc 2 duplicates doc 1 wholesale):
    // the old per-token array_contains rebuild was O(tokens × covered)
    // ≈ 1.6e9 comparisons in ONE row; the gap-slice form is
    // O(tokens + covered) and finishes in seconds
    val longText = (0 until 40000).map(i => s"t${i % 37}w$i").mkString(" ")
    val docs = Seq((1L, longText), (2L, longText)).toDF("doc_id", "text")
    val out = SpanDedup.removeDupSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 40000L && out(0).getLong(2) == 0L)
    assert(out(1).getLong(1) == 40000L && out(1).getLong(2) == 40000L)
    assert(out(1).getString(3) == "")
    assert(out(0).getString(3) == longText)
  }

  test("gap-slice rebuild: interleaved covered runs rebuild the exact complement") {
    // doc 2 shares two separated spans with doc 1; the kept text must be
    // exactly the uncovered segments in order, incl. a kept HEAD segment,
    // a kept middle gap, and a kept tail
    val out = run(Seq(
      1L -> "a1 a2 a3 a4 z1 z2 b1 b2 b3 b4",
      2L -> "h1 a1 a2 a3 a4 m1 m2 b1 b2 b3 b4 t1"), k = 4)
    assert(out(0)._3 == 0L)
    assert(out(1) == ((2L, 12L, 8L, "h1 m1 m2 t1")))
  }
}
