package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The recall guarantee of the shared banded-hamming core
  * (`Dedup.hamming64Pairs` — behind simhash, image dHash, audio eHash,
  * video tHash near-dedup): by pigeonhole, two 64-bit signatures within
  * hamming distance h agree on at least one of the h+1 chunks, so with
  * uncapped buckets the banded candidates + exact verify must equal the
  * brute-force pair set EXACTLY — total recall (pigeonhole) AND total
  * precision (exact hamming verify). Property-tested over random
  * corpora seeded with forced near-pairs, both materializeSigs modes. */
class HammingBandSpec extends SparkSpec {
  import spark.implicits._

  private val corpusGen: Gen[(Int, List[Long])] = for {
    maxH <- Gen.choose(0, 8)
    nBase <- Gen.choose(2, 10)
    bases <- Gen.listOfN(nBase, Gen.long)
    // variants of random bases within (and slightly beyond) maxH bits —
    // without forcing, random 64-bit pairs are never close
    variants <- Gen.listOfN(nBase * 2, for {
      b <- Gen.oneOf(bases)
      nbits <- Gen.choose(0, math.min(10, maxH + 2))
      idxs <- Gen.listOfN(nbits, Gen.choose(0, 63))
    } yield idxs.foldLeft(b)((s, i) => s ^ (1L << i)))
  } yield (maxH, bases ++ variants)

  test("banded pairs == brute force for any corpus and maxHamming (both modes)") {
    val prop = Prop.forAll(corpusGen) { case (maxH, sigs) =>
      val rows = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = rows.toDF("id", "sig")
      val want = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
      Seq(false, true).forall { mat =>
        val got = graft.operators.Dedup.hamming64Pairs(
          df, "id", col("sig"), maxH, materializeSigs = mat)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getAs[Number](2).longValue))
          .toSet
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
