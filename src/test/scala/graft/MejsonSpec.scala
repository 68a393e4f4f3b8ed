package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import graft.functions.{Mejson, RowUdf}

/** Extended-JSON codec: round-trip fidelity for every supported type and
  * type preservation through the RowUdf string boundary
  * (`function/gojajs/goja.go:94-101`). */
class MejsonSpec extends SparkSpec {

  private val richSchema = StructType(Seq(
    StructField("l", LongType),
    StructField("i", IntegerType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("ts", TimestampType),
    StructField("dt", DateType),
    StructField("bin", BinaryType),
    StructField("arr", ArrayType(LongType)),
    StructField("m", MapType(StringType, DoubleType)),
    StructField("nested", StructType(Seq(
      StructField("x", LongType), StructField("y", StringType))))))

  private def row(vals: Any*): Row =
    new GenericRowWithSchema(vals.toArray, richSchema)

  private def normalize(r: Row): Seq[Any] =
    r.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case m: scala.collection.Map[_, _] => m.toSeq.sortBy(_._1.toString)
      case s: scala.collection.Seq[_] => s.toList
      case x => x
    }

  test("round-trip property: parse(write(row)) == row for the rich schema") {
    val genRow: Gen[Row] = for {
      l <- Gen.oneOf(Gen.long, Gen.const(Long.MaxValue),
        Gen.const(Long.MinValue), Gen.const((1L << 53) + 1))
      i <- Gen.choose(Int.MinValue, Int.MaxValue)
      d <- Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.const(Double.NaN),
        Gen.const(Double.PositiveInfinity), Gen.const(1.0 / 3.0))
      s <- Gen.alphaNumStr.map(_ + "\"quoted\\slash\nnl")
      b <- Gen.oneOf(true, false)
      tsMs <- Gen.choose(0L, 4102444800000L)
      dDays <- Gen.choose(0, 20000)
      bin <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      arr <- Gen.listOf(Gen.long)
      mk <- Gen.listOf(Gen.zip(Gen.alphaNumStr, Gen.choose(-1e6, 1e6)))
      nx <- Gen.long
    } yield row(l, i, d, s, b, new java.sql.Timestamp(tsMs),
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(dDays.toLong)),
      bin.toArray, arr, mk.toMap,
      new GenericRowWithSchema(Array[Any](nx, s"n$nx"),
        richSchema("nested").dataType.asInstanceOf[StructType]))

    val prop = Prop.forAll(genRow) { r =>
      val back = Mejson.parse(Mejson.write(r), richSchema).asInstanceOf[Row]
      val a = normalize(back); val e = normalize(r)
      // NaN != NaN — compare representations
      a.toString == e.toString
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("null fields, missing fields, and nulls inside containers") {
    val r = row(null, null, null, null, null, null, null, null, null, null, null)
    val back = Mejson.parse(Mejson.write(r), richSchema).asInstanceOf[Row]
    assert(back.toSeq.forall(_ == null))
    // a field absent from the json lands as null
    val partial = Mejson.parse("""{"l":{"$numberLong":"7"}}""", richSchema)
      .asInstanceOf[Row]
    assert(partial.getAs[Long]("l") == 7L)
    assert(partial.getAs[Any]("s") == null)
  }

  test("type tags: long keeps 64 bits, $date is ms, binary is base64") {
    val big = (1L << 53) + 1 // corrupts through a plain JSON double
    val j = Mejson.write(big)
    assert(j == s"""{"$$numberLong":"$big"}""")
    assert(Mejson.parse(j, LongType) == big)
    val ts = new java.sql.Timestamp(1700000000123L)
    assert(Mejson.write(ts) == """{"$date":1700000000123}""")
    assert(Mejson.parse("""{"$date":{"$numberLong":"1700000000123"}}""",
      TimestampType) == ts) // canonical form also accepted
    assert(Mejson.parse(Mejson.write(Array[Byte](1, 2, 250.toByte)),
      BinaryType).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, -6))
  }

  test("udf round-trip over a dataframe matches the original rows") {
    val src = graft.core.Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .limit(200)
    val sch = src.schema
    val back = src
      .select(Mejson.to_mejson(struct(src.columns.map(col): _*)).as("mj"))
      .select(Mejson.from_mejson(col("mj"), sch).as("d")).select("d.*")
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("RowUdf.transformTyped preserves big longs and timestamps") {
    import spark.implicits._
    val big = (1L << 53) + 3
    val df = graft.core.Envelope.wrap(
      Seq((big, new java.sql.Timestamp(1700000000123L), 2.5))
        .toDF("bigid", "t", "v"), "docs")
    val outSchema = StructType(Seq(
      StructField("bigid", LongType),
      StructField("t", TimestampType),
      StructField("v", DoubleType)))
    val out = RowUdf.transformTyped(df, m => {
      // the udf sees mejson strings and can manipulate them losslessly
      val newV = Mejson.parse(m.doc("v"), DoubleType).asInstanceOf[Double] * 2
      Some(m.copy(doc = m.doc + ("v" -> Mejson.write(newV))))
    }, outSchema)
    val r = out.collect()(0)
    assert(r.getAs[Long]("bigid") == big) // a plain-string map would keep
    assert(r.getAs[java.sql.Timestamp]("t").getTime == 1700000000123L)
    assert(r.getAs[Double]("v") == 5.0)
    assert(out.schema("bigid").dataType == LongType)
    assert(out.schema("t").dataType == TimestampType)
  }
}
