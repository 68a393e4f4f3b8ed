package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Transforms
import graft.functions.expressions.MinHashSignature
import graft.operators.{Compaction, Upsert}

/** Property-based checks (SURVEY §5: ScalaCheck for skip-filter coercion and
  * compaction last-per-key). Spark-backed properties use few, small cases;
  * expression-level properties run pure-JVM via nullSafeEval. */
object MinHashProps extends Properties("MinHashSignature") {

  private val tokenGen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))

  private def sig(tokens: Seq[String], n: Int = 32): Seq[Long] =
    MinHashSignature(null, n)
      .nullSafeEval(new GenericArrayData(
        tokens.map(UTF8String.fromString).toArray))
      .asInstanceOf[ArrayData].toLongArray.toSeq

  property("order-invariant (min over a set)") = forAll(tokenGen) { ts =>
    sig(ts) == sig(scala.util.Random.shuffle(ts))
  }

  property("duplicate-invariant") = forAll(tokenGen) { ts =>
    sig(ts) == sig(ts ++ ts)
  }

  property("identical sets share every signature slot; supersets only min") =
    forAll(tokenGen, tokenGen) { (a, b) =>
      val sa = sig(a); val sab = sig(a ++ b)
      // adding elements can only lower each slot's min
      sa.zip(sab).forall { case (x, y) => y <= x }
    }
}

object CountMinProps extends Properties("CountMin") {

  import graft.functions.expressions.CountMinAggregate.CmsBuffer

  private val streamGen =
    Gen.nonEmptyListOf(Gen.chooseNum(0, 60).map(i => s"k$i"))
  private val shapeGen = for {
    d <- Gen.chooseNum(1, 6)
    w <- Gen.chooseNum(2, 128)
  } yield (d, w)

  private def truth(xs: List[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def sketch(xs: Seq[String], d: Int, w: Int): CmsBuffer = {
    val b = new CmsBuffer(d, w)
    xs.foreach(x => b.add(UTF8String.fromString(x)))
    b
  }

  property("one-sided at any shape: est >= true for every key") =
    forAll(streamGen, shapeGen) { case (xs, (d, w)) =>
      val sk = sketch(xs, d, w)
      truth(xs).forall { case (k, n) =>
        sk.estimate(UTF8String.fromString(k)) >= n
      }
    }

  property("arbitrary split + merge == single pass, bit-for-bit") =
    forAll(streamGen, shapeGen, Gen.chooseNum(0, 100)) {
      case (xs, (d, w), cutPct) =>
        val cut = xs.length * cutPct / 100
        val (l, r) = xs.splitAt(cut)
        val merged = sketch(l, d, w).mergeFrom(sketch(r, d, w))
        java.util.Arrays.equals(merged.toBytes, sketch(xs, d, w).toBytes)
    }

  property("serialize round-trips; estimates survive") =
    forAll(streamGen, shapeGen) { case (xs, (d, w)) =>
      val sk = sketch(xs, d, w)
      val back = graft.functions.expressions.CountMinAggregate
        .fromBytes(sk.toBytes)
      truth(xs).keys.forall { k =>
        back.estimate(UTF8String.fromString(k)) ==
          sk.estimate(UTF8String.fromString(k))
      }
    }

  property("total mass per row == n: sum of each row's counters") =
    forAll(streamGen, shapeGen) { case (xs, (d, w)) =>
      val sk = sketch(xs, d, w)
      (0 until d).forall { i =>
        (0 until w).map(j => sk.counts(i * w + j)).sum == xs.length.toLong
      }
    }
}

object MisraGriesProps extends Properties("MisraGries") {

  import graft.functions.expressions.MGSummary

  private val streamGen =
    Gen.nonEmptyListOf(Gen.chooseNum(0, 40).map(i => s"w$i"))
  private val capGen = Gen.chooseNum(1, 12)

  private def truth(xs: List[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def summarize(xs: Seq[String], cap: Int): MGSummary = {
    val s = new MGSummary(cap)
    xs.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  private def reported(s: MGSummary): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    s.counts.forEach((k, v) => b += k.toString -> v)
    b.result()
  }

  property("counts bounded: true - decs <= reported <= true; decs <= n/(cap+1)") =
    forAll(streamGen, capGen) { (xs, cap) =>
      val s = summarize(xs, cap)
      val t = truth(xs)
      val rep = reported(s)
      s.decs <= xs.length.toLong / (cap + 1) &&
        rep.forall { case (k, c) => c <= t(k) && c >= t(k) - s.decs } &&
        // any item more frequent than the total decrement must be present
        t.forall { case (k, c) => c <= s.decs || rep.contains(k) }
    }

  property("exact (decs == 0) when capacity >= distinct count") =
    forAll(streamGen) { xs =>
      val s = summarize(xs, truth(xs).size)
      s.decs == 0L && reported(s) == truth(xs)
    }

  property("arbitrary split + merge keeps the merged-summary bound") =
    forAll(streamGen, capGen, Gen.chooseNum(0, 100)) { (xs, cap, cut) =>
      val at = if (xs.isEmpty) 0 else cut % xs.length
      val (l, r) = xs.splitAt(at)
      val m = summarize(l, cap).mergeFrom(summarize(r, cap))
      val t = truth(xs)
      val rep = reported(m)
      m.counts.size <= cap &&
        m.decs <= xs.length.toLong / (cap + 1) &&
        rep.forall { case (k, c) => c <= t(k) && c >= t(k) - m.decs }
    }
}

object EngineProps extends Properties("Engine") {

  private lazy val spark = SparkSpec.session
  import scala.jdk.CollectionConverters._

  private val doublesGen =
    Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))

  property("skip '>' numeric coercion == Scala filter (string rhs)") =
    forAll(doublesGen, Gen.chooseNum(-1000.0, 1000.0)) { (vs, thr) =>
      val df = spark.createDataFrame(
        vs.map(v => org.apache.spark.sql.Row(v)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("x",
            org.apache.spark.sql.types.DoubleType))))
      val kept = Transforms.skip("x", ">", thr.toString)(df).count()
      kept == vs.count(_ > thr)
    }

  private val cdcGen = Gen.nonEmptyListOf(for {
    id <- Gen.chooseNum(0L, 5L)
    op <- Gen.oneOf("insert", "update", "delete", "noop")
    v <- Gen.chooseNum(0.0, 100.0)
  } yield (id, op, v))

  property("compaction lastPerKey picks max-offset row per key") =
    forAll(cdcGen) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((id, op, v), off) => (id, op, v, off.toLong) }
        .toDF("id", "op", "v", "off")
      val got = Compaction.lastPerKey(Seq("id"), Seq(col("off")))(df)
        .select("id", "off").collect()
        .map(r => (r.getLong(0), r.getLong(3 - 2))).toMap
      val want = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (id, g) => (id, g.map(_._2.toLong).max) }
      got == want
    }

  property("applyCdc idempotent: apply twice == apply once") =
    forAll(cdcGen) { rows =>
      import spark.implicits._
      val batch = rows.zipWithIndex
        .map { case ((id, op, v), off) => (op, id, v, off.toLong) }
        .toDF("op", "id", "v", "off")
      val base = batch.select("id", "v").limit(0)
      def state(b: org.apache.spark.sql.DataFrame) =
        Upsert.applyCdc(b, batch, "id", Seq(col("off")))
      val once = state(base).orderBy("id").collect().toSeq
      val twice = state(state(base)).orderBy("id").collect().toSeq
      once == twice
    }
}

/** WKB → WKT reader (MysqlBinlog): random geometry ASTs encoded to
  * spec-exact well-known-binary (both endiannesses) must decode to the
  * WKT built independently from the same AST. */
object WkbProps extends Properties("WkbToWkt") {

  import java.nio.{ByteBuffer, ByteOrder}

  private val coordGen: Gen[Double] =
    Gen.chooseNum(-1000, 1000).map(_ / 4.0) // exact quarters: stable text

  private def fmt(x: Double): String =
    if (x == x.toLong.toDouble) x.toLong.toString else x.toString

  sealed trait G
  final case class P(x: Double, y: Double) extends G
  final case class Ls(ps: List[P]) extends G
  final case class Poly(rings: List[List[P]]) extends G
  final case class Multi(kind: Int, gs: List[G]) extends G

  private val pGen = for { x <- coordGen; y <- coordGen } yield P(x, y)
  private val lsGen = Gen.nonEmptyListOf(pGen).map(ps => Ls(ps.take(6)))
  private val polyGen = Gen.nonEmptyListOf(Gen.nonEmptyListOf(pGen))
    .map(rs => Poly(rs.take(3).map(_.take(5))))
  private val multiGen: Gen[Multi] = Gen.oneOf(
    Gen.nonEmptyListOf(pGen).map(ps => Multi(4, ps.take(4))),
    Gen.nonEmptyListOf(lsGen).map(ls => Multi(5, ls.take(3))),
    Gen.nonEmptyListOf(polyGen).map(ps => Multi(6, ps.take(3))))
  private val geomGen: Gen[G] =
    Gen.oneOf(pGen, lsGen, polyGen, multiGen,
      Gen.nonEmptyListOf(Gen.oneOf[G](pGen, lsGen, polyGen))
        .map(gs => Multi(7, gs.take(3))))

  private def encode(g: G, little: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def bb(n: Int) = ByteBuffer.allocate(n).order(
      if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    def writeHeader(t: Int): Unit = {
      out.write(if (little) 1 else 0)
      out.write(bb(4).putInt(t).array())
    }
    def writePoints(ps: List[P]): Unit = {
      out.write(bb(4).putInt(ps.size).array())
      ps.foreach(p =>
        out.write(bb(16).putDouble(p.x).putDouble(p.y).array()))
    }
    g match {
      case P(x, y) =>
        writeHeader(1); out.write(bb(16).putDouble(x).putDouble(y).array())
      case Ls(ps) => writeHeader(2); writePoints(ps)
      case Poly(rings) =>
        writeHeader(3); out.write(bb(4).putInt(rings.size).array())
        rings.foreach(writePoints)
      case Multi(kind, gs) =>
        writeHeader(kind); out.write(bb(4).putInt(gs.size).array())
        gs.foreach(sub => out.write(encode(sub, little)))
    }
    out.toByteArray
  }

  private def wkt(g: G): String = g match {
    case P(x, y) => s"POINT (${fmt(x)} ${fmt(y)})"
    case Ls(ps) =>
      s"LINESTRING ${ps.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString("(", ", ", ")")}"
    case Poly(rings) =>
      s"POLYGON ${rings.map(r => r.map(p => s"${fmt(p.x)} ${fmt(p.y)}")
        .mkString("(", ", ", ")")).mkString("(", ", ", ")")}"
    case Multi(4, gs) =>
      s"MULTIPOINT ${gs.collect { case P(x, y) => s"(${fmt(x)} ${fmt(y)})" }
        .mkString("(", ", ", ")")}"
    case Multi(5, gs) =>
      s"MULTILINESTRING ${gs.collect { case l: Ls =>
        wkt(l).stripPrefix("LINESTRING ") }.mkString("(", ", ", ")")}"
    case Multi(6, gs) =>
      s"MULTIPOLYGON ${gs.collect { case p: Poly =>
        wkt(p).stripPrefix("POLYGON ") }.mkString("(", ", ", ")")}"
    case Multi(_, gs) =>
      s"GEOMETRYCOLLECTION ${gs.map(wkt).mkString("(", ", ", ")")}"
  }

  property("decode(encode(g)) == wkt(g), either endianness") =
    forAll(geomGen, Gen.oneOf(true, false)) { (g, little) =>
      graft.sources.MysqlBinlog.wkbToWkt(encode(g, little)) == wkt(g)
    }
}

/** Wire-format parsers must be total: arbitrary garbage (including
  * truncations of VALID lines — the nastier case) never throws, it
  * parses or skips. A tailer that dies on a malformed log line loses
  * the stream. */
object ParserTotalityProps extends Properties("CdcParserTotality") {

  private val validOplog =
    """{"ts":{"$timestamp":{"t":1700000010,"i":1}},"h":-4,"v":2,"op":"i","ns":"db.users","o":{"_id":7,"name":"ann"}}"""
  private val validPg =
    """table public.users: UPDATE: id[integer]:2 name[text]:'it''s' tags[text[]]:'{a,b}'"""
  private val validBinlog =
    """{"type":"UPDATE_ROWS_EVENTv2","schema":"db","table":"r","rows":[["1","a"],["1","b"]]}"""

  private def garbled(base: String): Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.chooseNum(0, base.length).map(base.take),
    Gen.chooseNum(0, base.length).map(base.drop),
    Gen.const(base.replace(":", "")),
    Gen.const(base.reverse))

  property("mongo oplog parseLine is total") =
    forAll(garbled(validOplog)) { s =>
      graft.sources.MongoOplog.parseLine(s); true
    }

  property("pg test_decoding parseLine is total") =
    forAll(garbled(validPg)) { s =>
      graft.sources.PgDecoding.parseLine(s); true
    }

  property("mysql binlog processEvent is total") =
    forAll(garbled(validBinlog)) { s =>
      graft.sources.MysqlBinlog.processEvent(s,
        Map("db.r" -> Seq(("id", "int"), ("v", "varchar")))); true
    }
}

/** Oplog applyCdc (MongoOplog): applying a random op sequence through
  * the engine equals a sequential driver-side fold of the same ops —
  * the reference's one-at-a-time apply. */
object OplogProps extends Properties("MongoOplogApply") {

  private lazy val spark = SparkSpec.session

  private val opGen = for {
    id <- Gen.chooseNum(1L, 6L)
    op <- Gen.oneOf("i", "d")
    v <- Gen.chooseNum(1, 999)
  } yield (id, op, v)

  property("engine applyCdc == sequential fold") =
    forAll(Gen.listOf(opGen).map(_.take(14))) { ops =>
      import spark.implicits._
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("_id", LongType),
        StructField("v", LongType)))
      val lines = ops.zipWithIndex.map { case ((id, op, v), i) =>
        val o = if (op == "d") s"""{"_id":$id}"""
                else s"""{"_id":$id,"v":$v}"""
        s"""{"ts":{"$$timestamp":{"t":${1700000000L + i},"i":1}},"h":$i,"v":2,"op":"$op","ns":"db.t","o":$o}"""
      }
      val base = Seq.empty[(Long, Long)].toDF("_id", "v")
      val got =
        if (lines.isEmpty) Map.empty[Long, Long]
        else graft.sources.MongoOplog.applyCdc(base,
          graft.sources.MongoOplog.changes(lines.toDF("value")), schema)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ops.foldLeft(Map.empty[Long, Long]) {
        case (m, (id, "i", v)) => m + (id -> v.toLong)
        case (m, (id, _, _)) => m - id
      }
      got == want
    }
}

/** Cross-doc duplicate-span removal vs an independent local reference:
  * the keeper/coverage/rebuild semantics must agree on arbitrary small
  * corpora (tiny vocab so duplicate k-grams actually occur). */
object SpanDedupProps extends Properties("SpanDedup") {

  private lazy val spark = SparkSpec.session
  private val K = 3

  private val corpusGen: Gen[List[String]] = Gen.sized { _ =>
    Gen.choose(2, 6).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
          .map(_.mkString(" "))))
    }
  }

  private def reference(docs: Seq[(Long, String)], k: Int)
      : Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }
    val grams = for {
      (id, ws) <- toks
      p <- 1 to (ws.length - k + 1)
    } yield (id, p, ws.slice(p - 1, p - 1 + k).mkString(" "))
    val keeper = grams.groupBy(_._3)
      .collect { case (g, occ) if occ.map(_._1).distinct.size > 1 =>
        g -> occ.map(_._1).min }
    val covered = grams
      .filter { case (id, _, g) => keeper.get(g).exists(_ != id) }
      .flatMap { case (id, p, _) => (p until p + k).map(id -> _) }
      .toSet
    toks.map { case (id, ws) =>
      val kept = ws.zipWithIndex.collect {
        case (w, i) if !covered(id -> (i + 1)) => w }
      id -> ((ws.length.toLong,
        ws.indices.count(i => covered(id -> (i + 1))).toLong,
        kept.mkString(" ")))
    }.toMap
  }

  property("removeDupSpans == local reference") = forAll(corpusGen) { texts =>
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.SpanDedup
      .removeDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", K)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    got == reference(docs, K)
  }
}

/** BM25 vs an independent local reference on arbitrary small-vocab
  * corpora and queries — keeps the distributed postings/df/stats/score
  * assembly honest on shapes the fixture doesn't produce (single-doc
  * corpora, every-doc-matches, no-doc-matches, repeated terms). */
object TextSearchProps extends Properties("TextSearchBm25") {

  private lazy val spark = SparkSpec.session
  private val vocab = Seq("a", "b", "c", "d", "e")

  private val corpusGen: Gen[List[String]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.choose(1, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))))

  private val queryGen: Gen[String] =
    Gen.choose(1, 3).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab :+ "zz")).map(_.mkString(" ")))

  private def reference(corpus: Seq[(Long, Seq[String])],
      query: Seq[String]): Map[Long, Long] = {
    val n = corpus.size
    val avgdl = corpus.map(_._2.size).sum.toDouble / n
    val dfm = corpus.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, g) => t -> g.size }
    corpus.flatMap { case (id, ts) =>
      val s = query.distinct.filter(dfm.contains).map { term =>
        val tf = ts.count(_ == term)
        if (tf == 0) 0L
        else {
          val idf = math.log((n - dfm(term) + 0.5) / (dfm(term) + 0.5) + 1.0)
          val tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * ts.size / avgdl))
          math.floor(idf * tfn * 1e9).toLong
        }
      }.sum
      if (s != 0L) Some(id -> s) else None
    }.toMap
  }

  property("bm25TopK == local reference (scores and membership)") =
    forAll(corpusGen, queryGen) { (texts, qtext) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.TextSearch.bm25TopK(
          docs.toDF("doc_id", "text"),
          "doc_id", "text",
          Seq((0L, qtext)).toDF("query_id", "query_text"),
          "query_id", "query_text", k = 100)
        .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
      val want = reference(
        docs.map { case (id, t) => (id, t.split(" ").toSeq) },
        qtext.split(" ").toSeq)
      got == want
    }
}
