package graft.functions

import java.util.Base64

import org.apache.spark.sql.Column
import org.apache.spark.sql.Row
import org.apache.spark.sql.api.java.{UDF1, UDF2}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Extended JSON ("mejson") — the reference's type-preserving interchange
  * format, used wherever a document crosses a string boundary without
  * losing its types: commit-log persistence (`pipeline/node.go:461-462`),
  * resume deserialization (`pipeline/resume.go:28-37`), JS-UDF
  * marshalling (`function/gojajs/goja.go:94-101`), pretty-printing
  * (`function/pretty/prettify.go:34-40`).
  *
  * Encoding (MongoDB extended-JSON conventions, as the mejson library
  * emits them):
  *
  *   - timestamp/date      → {"$date": <epoch-millis>} (BSON datetime is
  *                           ms-precision; sub-ms truncates, same as the
  *                           reference's time.Time round-trip)
  *   - long                → {"$numberLong": "<v>"} (JSON numbers corrupt
  *                           |v| > 2^53; the tag keeps all 64 bits)
  *   - decimal             → {"$numberDecimal": "<v>"}
  *   - binary              → {"$binary": "<base64>", "$type": "00"}
  *   - double NaN/±Inf     → {"$numberDouble": "NaN"|"Infinity"|"-Infinity"}
  *   - int/short/byte, finite double/float, boolean, string, null → plain
  *     JSON; struct/map → object; array → array.
  *
  * Decoding is SCHEMA-DRIVEN (`from_mejson(col, schema)`): tags are
  * recognized wherever they appear and values coerce to the target field
  * type, so `to_mejson → from_mejson` is lossless for every supported
  * type except sub-millisecond time (by design, above).
  *
  * UDF-first per SURVEY §7.2: this is a (de)serialization boundary, not
  * Column algebra — same status as the reference's per-message marshal.
  */
object Mejson {

  // ---- writer: external (Row-land) value → JValue with type tags ----

  def toJValue(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Byte => JInt(BigInt(i))
    case i: Short => JInt(BigInt(i))
    case i: Int => JInt(BigInt(i))
    case l: Long => JObject(List("$numberLong" -> JString(l.toString)))
    case f: Float => toJValue(f.toDouble)
    case d: Double =>
      if (d.isNaN || d.isInfinite)
        JObject(List("$numberDouble" -> JString(
          if (d.isNaN) "NaN" else if (d > 0) "Infinity" else "-Infinity")))
      else JDouble(d)
    case d: java.math.BigDecimal =>
      JObject(List("$numberDecimal" -> JString(d.toPlainString)))
    case d: BigDecimal =>
      JObject(List("$numberDecimal" -> JString(d.underlying.toPlainString)))
    case t: java.sql.Timestamp =>
      JObject(List("$date" -> JInt(BigInt(t.getTime))))
    case t: java.time.Instant =>
      JObject(List("$date" -> JInt(BigInt(t.toEpochMilli))))
    case t: java.time.LocalDateTime =>
      // TIMESTAMP_NTZ's external type. BSON datetime is an epoch instant;
      // the reference marshals every temporal through {$date: ms}
      // (function/gojajs/goja.go:94-101), so an NTZ wall-clock is pinned
      // at UTC — the same convention LocalDate uses below.
      JObject(List("$date" -> JInt(BigInt(
        t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli))))
    case d: java.sql.Date =>
      JObject(List("$date" -> JInt(BigInt(d.getTime))))
    case d: java.time.LocalDate =>
      JObject(List("$date" -> JInt(BigInt(
        d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli))))
    case b: Array[Byte] =>
      JObject(List("$binary" -> JString(Base64.getEncoder.encodeToString(b)),
        "$type" -> JString("00")))
    case r: Row =>
      val names = r.schema match {
        case null => (1 to r.length).map(i => s"col$i")
        case s => s.fieldNames.toIndexedSeq
      }
      JObject(names.zipWithIndex.map { case (n, i) =>
        n -> toJValue(r.get(i)) }.toList)
    case m: scala.collection.Map[_, _] =>
      JObject(m.toList.map { case (k, x) => String.valueOf(k) -> toJValue(x) }
        .sortBy(_._1)) // deterministic field order for stable hashing
    case s: scala.collection.Seq[_] => JArray(s.toList.map(toJValue))
    case a: Array[_] => JArray(a.toList.map(toJValue))
    case other => JString(String.valueOf(other))
  }

  def write(v: Any): String = JsonMethods.compact(JsonMethods.render(toJValue(v)))

  // ---- reader: JValue + target Spark type → external value ----

  private def dateMillis(j: JValue): Option[Long] = j match {
    case JObject(fields) => fields.collectFirst {
      case ("$date", JInt(ms)) => ms.toLong
      case ("$date", JObject(inner)) => inner.collectFirst {
        case ("$numberLong", JString(s)) => s.toLong
      }.getOrElse(sys.error("bad $date"))
    }
    case _ => None
  }

  private def taggedNumber(j: JValue): Option[BigDecimal] = j match {
    case JObject(fields) => fields.collectFirst {
      case ("$numberLong", JString(s)) => BigDecimal(s)
      case ("$numberDecimal", JString(s)) => BigDecimal(s)
      case ("$numberDouble", JString(s)) => s match {
        case "NaN" => BigDecimal(0) // handled separately below
        case _ => BigDecimal(s.toDouble)
      }
    }
    case _ => None
  }

  private def asDouble(j: JValue): Double = j match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case JObject(fields) => fields.collectFirst {
      case ("$numberDouble", JString("NaN")) => Double.NaN
      case ("$numberDouble", JString("Infinity")) => Double.PositiveInfinity
      case ("$numberDouble", JString("-Infinity")) => Double.NegativeInfinity
      case ("$numberDouble", JString(s)) => s.toDouble
      case ("$numberLong", JString(s)) => s.toDouble
      case ("$numberDecimal", JString(s)) => s.toDouble
    }.getOrElse(sys.error(s"not a double: $j"))
    case other => sys.error(s"not a double: $other")
  }

  private def asBigInt(j: JValue): BigInt = j match {
    case JInt(i) => i
    case JLong(l) => BigInt(l)
    case JDouble(d) => BigInt(d.toLong)
    case JDecimal(d) => d.toBigInt
    case other => taggedNumber(other).map(_.toBigInt)
      .getOrElse(sys.error(s"not an integer: $other"))
  }

  def fromJValue(j: JValue, dt: DataType): Any =
    if (j == JNull || j == JNothing) null
    else dt match {
      case StringType => j match {
        case JString(s) => s
        case other => JsonMethods.compact(JsonMethods.render(other))
      }
      case BooleanType => j match {
        case JBool(b) => b
        case other => sys.error(s"not a boolean: $other")
      }
      case ByteType => asBigInt(j).toByte
      case ShortType => asBigInt(j).toShort
      case IntegerType => asBigInt(j).toInt
      case LongType => asBigInt(j).toLong
      case FloatType => asDouble(j).toFloat
      case DoubleType => asDouble(j)
      case d: DecimalType => (j match {
        case JDecimal(x) => x
        case JDouble(x) => BigDecimal(x)
        case JInt(x) => BigDecimal(x)
        case other => taggedNumber(other)
          .getOrElse(sys.error(s"not a decimal: $other"))
      }).setScale(d.scale, BigDecimal.RoundingMode.HALF_UP).underlying()
      case TimestampType =>
        new java.sql.Timestamp(dateMillis(j)
          .getOrElse(sys.error(s"not a $$date: $j")))
      case TimestampNTZType =>
        // NTZ's external type is LocalDateTime, not java.sql.Timestamp —
        // returning the wrong class makes CatalystTypeConverters throw.
        // Inverse of the writer: $date ms interpreted as a UTC wall-clock.
        java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(dateMillis(j)
            .getOrElse(sys.error(s"not a $$date: $j"))),
          java.time.ZoneOffset.UTC)
      case DateType =>
        java.sql.Date.valueOf(java.time.Instant
          .ofEpochMilli(dateMillis(j).getOrElse(sys.error(s"not a $$date: $j")))
          .atZone(java.time.ZoneOffset.UTC).toLocalDate)
      case BinaryType => j match {
        case JObject(fields) => fields.collectFirst {
          case ("$binary", JString(b64)) => Base64.getDecoder.decode(b64)
        }.getOrElse(sys.error(s"not a $$binary: $j"))
        case JString(b64) => Base64.getDecoder.decode(b64)
        case other => sys.error(s"not binary: $other")
      }
      case st: StructType => j match {
        case JObject(fields) =>
          val byName = fields.toMap
          new GenericRowWithSchema(st.fields.map(f =>
            fromJValue(byName.getOrElse(f.name, JNull), f.dataType)), st)
        case other => sys.error(s"not an object: $other")
      }
      case MapType(StringType, vt, _) => j match {
        case JObject(fields) => fields.map { case (k, x) =>
          k -> fromJValue(x, vt) }.toMap
        case other => sys.error(s"not an object: $other")
      }
      case ArrayType(et, _) => j match {
        case JArray(xs) => xs.map(fromJValue(_, et))
        case other => sys.error(s"not an array: $other")
      }
      case other => sys.error(s"unsupported mejson target type: ${other.sql}")
    }

  def parse(s: String, dt: DataType): Any =
    fromJValue(JsonMethods.parse(s), dt)

  // ---- Column builders (UDF-first, SURVEY §7.2) ----

  /** Serialize a struct column (or any single column) to extended JSON. */
  def to_mejson(c: Column): Column =
    udf(new UDF1[Any, String] {
      override def call(v: Any): String = write(v)
    }, StringType).apply(c)

  /** Parse an extended-JSON string column into `schema` (or any target
    * type), recognizing type tags. */
  def from_mejson(c: Column, dt: DataType): Column =
    udf(new UDF1[String, Any] {
      override def call(s: String): Any = if (s == null) null else parse(s, dt)
    }, dt).apply(c)
}
