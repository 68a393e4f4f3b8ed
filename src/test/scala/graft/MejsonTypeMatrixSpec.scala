package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}

import graft.functions.Mejson

/** Property suite over the FULL mejson type matrix — every Spark type the
  * codec claims × every temporal external form ({LTZ: java.sql.Timestamp /
  * Instant, NTZ: LocalDateTime, Date: java.sql.Date / LocalDate}) ×
  * null / extreme values — pinned to the reference's `{"$date": ms}`
  * contract (BSON datetime is ms-precision epoch; DESIGN.md §Messages,
  * `function/gojajs/goja.go:94-101`).
  *
  * This is the suite that would have caught the round-8 fixture flip
  * (TIMESTAMP(NANOS)-as-INT64 → TIMESTAMP(MICROS, NTZ)) before the
  * correctness gate did: the codec must round-trip whatever external
  * temporal class Spark hands it, not just the flavor of the day.
  */
class MejsonTypeMatrixSpec extends SparkSpec {

  // ---- generators: (DataType, external value) pairs ----

  private val genMs: Gen[Long] = Gen.oneOf(
    Gen.choose(-62135596800000L, 253402300799999L), // year 1..9999
    Gen.const(0L), Gen.const(-1L),                  // epoch, pre-epoch
    Gen.const(1700000000123L))

  /** value generator for a fixed atomic type — null and extremes mixed in */
  private val atomicGens: Map[DataType, Gen[Any]] = Map(
    StringType -> Gen.oneOf[Any](null, "x", "", "\"quote\\back\nnl", "é中文"),
    BooleanType -> Gen.oneOf[Any](null, true, false),
    ByteType -> Gen.oneOf(Gen.const[Any](null),
      Gen.choose(Byte.MinValue, Byte.MaxValue).map(x => x: Any)),
    ShortType -> Gen.oneOf(Gen.const[Any](null),
      Gen.choose(Short.MinValue, Short.MaxValue).map(x => x: Any)),
    IntegerType -> Gen.oneOf(Gen.const[Any](null),
      Gen.choose(Int.MinValue, Int.MaxValue).map(x => x: Any)),
    LongType -> Gen.oneOf[Any](null, 0L, Long.MinValue, Long.MaxValue,
      (1L << 53) + 1),
    FloatType -> Gen.oneOf[Any](null, 0.0f, -1.5f, Float.NaN,
      Float.PositiveInfinity),
    DoubleType -> Gen.oneOf(Gen.const[Any](null),
      Gen.choose(-1e12, 1e12).map(x => x: Any),
      Gen.oneOf[Any](Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 1.0 / 3.0)),
    DecimalType(10, 2) -> Gen.oneOf[Any](null,
      new java.math.BigDecimal("0.01"),
      new java.math.BigDecimal("-99999999.99"),
      new java.math.BigDecimal("12345678.90")),
    BinaryType -> Gen.oneOf(Gen.const[Any](null),
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(bs => bs.toArray: Any)),
    // temporals: each Spark external class the codec must accept
    TimestampType -> Gen.oneOf(Gen.const[Any](null),
      genMs.map(ms => new java.sql.Timestamp(ms): Any)),
    TimestampNTZType -> Gen.oneOf(Gen.const[Any](null),
      genMs.map(ms => java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC): Any)),
    DateType -> Gen.oneOf(Gen.const[Any](null),
      Gen.choose(-100000, 100000).map(d =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)): Any)))

  private val genAtomicType: Gen[DataType] = Gen.oneOf(atomicGens.keys.toSeq)

  /** a type of bounded depth: atomics at 0; arrays/maps/structs above */
  private def genType(depth: Int): Gen[DataType] =
    if (depth <= 0) genAtomicType
    else Gen.frequency(
      4 -> genAtomicType,
      1 -> genType(depth - 1).map(ArrayType(_): DataType),
      1 -> genType(depth - 1).map(MapType(StringType, _): DataType),
      1 -> Gen.listOfN(3, genType(depth - 1)).map(ts => StructType(
        ts.zipWithIndex.map { case (t, i) => StructField(s"f$i", t) })))

  /** a value of exactly type `dt` (external / Row-land representation) */
  private def genValue(dt: DataType): Gen[Any] = dt match {
    case ArrayType(et, _) =>
      Gen.oneOf(Gen.const[Any](null),
        Gen.listOfN(3, genValue(et)).map(vs => vs: Any))
    case MapType(StringType, vt, _) =>
      Gen.oneOf(Gen.const[Any](null),
        Gen.listOfN(3, Gen.zip(Gen.identifier, genValue(vt)))
          .map(kvs => kvs.toMap: Any))
    case st: StructType =>
      Gen.sequence[List[Any], Any](st.fields.toList.map(f =>
        genValue(f.dataType))).map(vs =>
          new GenericRowWithSchema(vs.toArray, st): Any)
    case atomic => atomicGens(atomic)
  }

  private def typedValue(depth: Int): Gen[(DataType, Any)] =
    genType(depth).flatMap(dt => genValue(dt).map(dt -> _))

  // structural equality with NaN / byte-array / map-order normalization
  private def norm(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => b.toSeq
    case a: Array[_] => a.toSeq.map(norm)
    case s: scala.collection.Seq[_] => s.toList.map(norm)
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => (String.valueOf(k), norm(x)) }
        .sortBy(_._1)
    case r: Row => r.toSeq.map(norm)
    case d: Double if d.isNaN => "NaN"
    case f: Float if f.isNaN => "NaN"
    case f: Float => f.toDouble
    case d: java.math.BigDecimal => BigDecimal(d)
    case x => x
  }

  test("round-trip property over the generated type matrix") {
    val prop = Prop.forAll(typedValue(2)) { case (dt, v) =>
      val back = Mejson.parse(Mejson.write(v), dt)
      norm(back) == norm(v)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("every temporal external class encodes as {$date: ms} at UTC") {
    val ms = 1700000000123L
    val expected = s"""{"$$date":$ms}"""
    assert(Mejson.write(new java.sql.Timestamp(ms)) == expected)
    assert(Mejson.write(java.time.Instant.ofEpochMilli(ms)) == expected)
    assert(Mejson.write(java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC))
      == expected)
    val day = java.time.LocalDate.of(2024, 2, 29)
    val dayMs = day.atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli
    assert(Mejson.write(java.sql.Date.valueOf(day)) ==
      s"""{"$$date":${java.sql.Date.valueOf(day).getTime}}""")
    assert(Mejson.write(day) == s"""{"$$date":$dayMs}""")
  }

  test("NTZ decode returns LocalDateTime (the NTZ external type), LTZ a Timestamp") {
    val j = """{"$date":1700000000123}"""
    val ntz = Mejson.parse(j, TimestampNTZType)
    assert(ntz.isInstanceOf[java.time.LocalDateTime], ntz.getClass)
    assert(ntz == java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(1700000000123L),
      java.time.ZoneOffset.UTC))
    val ltz = Mejson.parse(j, TimestampType)
    assert(ltz.isInstanceOf[java.sql.Timestamp], ltz.getClass)
    assert(ltz.asInstanceOf[java.sql.Timestamp].getTime == 1700000000123L)
    // sub-ms truncation is by design (BSON datetime is ms)
    val sub = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(1700000000123L),
      java.time.ZoneOffset.UTC).plusNanos(456789)
    val back = Mejson.parse(Mejson.write(sub), TimestampNTZType)
    assert(back == sub.minusNanos(456789))
  }

  test("NTZ survives a dataframe mejson round-trip") {
    import spark.implicits._
    val src = Seq(1L, 2L, 3L).toDF("id")
      .withColumn("t", timestamp_micros(col("id") * 1000003L + 1700000000000000L)
        .cast(TimestampNTZType))
    val sch = src.schema
    val back = src
      .select(Mejson.to_mejson(struct(src.columns.map(col): _*)).as("mj"))
      .select(Mejson.from_mejson(col("mj"), sch).as("d")).select("d.*")
    // ms truncation: compare at ms precision
    val want = src.withColumn("t", date_trunc("MILLISECOND", col("t"))
      .cast(TimestampNTZType))
    assert(back.exceptAll(want).count() == 0 &&
      want.exceptAll(back).count() == 0)
  }

  test("Tables.table normalizes µs-NTZ parquet to session-UTC TimestampType") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    Seq((1L, "2024-01-01T00:00:07.179575"), (2L, "1999-12-31T23:59:59.999999"))
      .toDF("event_id", "s")
      .withColumn("ts", col("s").cast(TimestampNTZType)).drop("s")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType, raw.schema) // fixture flavor
    val norm = graft.core.Tables.table(spark, dir, "events")
    assert(norm.schema("ts").dataType == TimestampType, norm.schema)
    // session tz is UTC, so the wall-clock is preserved verbatim
    val got = norm.orderBy("event_id")
      .select(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .as[String].collect()
    assert(got.sameElements(Array(
      "2024-01-01T00:00:07.179575", "1999-12-31T23:59:59.999999")), got.toSeq)
  }
}
