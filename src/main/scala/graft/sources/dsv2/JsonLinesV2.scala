package graft.sources.dsv2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

/** DataSource V2 connector for JSON-lines document dirs — the reference's
  * file adaptor (`adaptor/file/reader.go:25-72`) as a first-class table
  * with PLAN-VISIBLE pushdown (SURVEY §4/§7.2):
  *
  *   - `SupportsPushDownFilters`: eq/gt/gte/lt/lte/isnotnull/in on
  *     top-level atomic fields are accepted into the scan and evaluated
  *     DURING parsing — matching the reference pushing
  *     `collection_filters` into the server-side query
  *     (`adaptor/mongodb/reader.go:172-181`). The resumable `id > last`
  *     cursor is exactly a pushed GreaterThan. Unsupported filters are
  *     handed back to Spark as residuals.
  *   - `SupportsPushDownRequiredColumns`: only requested fields are
  *     MATERIALIZED from each parsed line (column pruning at the parse
  *     boundary).
  *   - one InputPartition per file: a directory of N files scans with
  *     parallelism N across executors, no driver-side row handling.
  *
  * Tests assert pushdown at the PLAN level (BatchScanExec → this Scan's
  * `pushedFilters`), not by string-matching explain output.
  *
  * Usage: `spark.read.format("graft-jsonl").schema(s).load(dir)`.
  */
class JsonLinesTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"
  override def supportsExternalMetadata(): Boolean = true

  private def listFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-jsonl requires a path"))
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.map(_.toString)
        .filter(f => !f.endsWith(".crc") && !new java.io.File(f).isDirectory &&
          !new java.io.File(f).getName.startsWith("_") &&
          !new java.io.File(f).getName.startsWith("."))
        .toSeq.sorted
      finally s.close()
    } else Seq(path)
  }

  /** Schema inference: sample the first line — strings/booleans/longs/
    * doubles only (pass an explicit schema for anything richer, as at
    * scale one should anyway). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val first = listFiles(options).iterator
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f)
        try src.getLines().take(1).toList finally src.close()
      }.take(1).toList
    first match {
      case line :: Nil => JsonMethods.parse(line) match {
        case JObject(fields) => StructType(fields.map {
          case (k, JBool(_)) => StructField(k, BooleanType)
          case (k, JInt(_)) => StructField(k, LongType)
          case (k, JLong(_)) => StructField(k, LongType)
          case (k, JDouble(_)) => StructField(k, DoubleType)
          case (k, JDecimal(_)) => StructField(k, DoubleType)
          case (k, _) => StructField(k, StringType)
        })
        case _ => throw new IllegalArgumentException("first line is not an object")
      }
      case _ => throw new IllegalArgumentException("empty graft-jsonl source")
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new JsonLinesTable(schema,
      listFiles(new CaseInsensitiveStringMap(properties)))
}

final class JsonLinesTable(tblSchema: StructType, files: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-jsonl(${files.size} files)"
  override def schema(): StructType = tblSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonLinesScanBuilder(tblSchema, files)
}

final class JsonLinesScanBuilder(fullSchema: StructType, files: Seq[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  private def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => isAtomic(a)
    case GreaterThan(a, _) => isAtomic(a)
    case GreaterThanOrEqual(a, _) => isAtomic(a)
    case LessThan(a, _) => isAtomic(a)
    case LessThanOrEqual(a, _) => isAtomic(a)
    case In(a, _) => isAtomic(a)
    case IsNotNull(a) => isAtomic(a)
    case IsNull(a) => isAtomic(a)
    case _ => false // And/Or/StringContains/… stay residual
  }

  private def isAtomic(attr: String): Boolean =
    fullSchema.fields.find(_.name == attr).exists(_.dataType match {
      case StringType | LongType | IntegerType | DoubleType | BooleanType => true
      case _ => false
    })

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(pushable)
    pushed = ok
    residual // Spark keeps a Filter node for these
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new JsonLinesScan(fullSchema, required, files, pushed)
}

final case class JsonLinesInputPartition(file: String) extends InputPartition

final class JsonLinesScan(fullSchema: StructType, required: StructType,
    files: Seq[String], filters: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-jsonl PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  /** Exposed for plan-level asserts. */
  def pushedFilters: Seq[Filter] = filters.toSeq

  override def planInputPartitions(): Array[InputPartition] =
    files.map(JsonLinesInputPartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonLinesReaderFactory(fullSchema, required, filters)
}

final class JsonLinesReaderFactory(fullSchema: StructType,
    required: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new JsonLinesPartitionReader(
      p.asInstanceOf[JsonLinesInputPartition].file, fullSchema, required,
      filters)
}

/** Streams one file; parses, filters (pushed predicates), projects. */
final class JsonLinesPartitionReader(file: String, fullSchema: StructType,
    required: StructType, filters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val source = scala.io.Source.fromFile(file)
  private val lines = source.getLines()
  private var current: InternalRow = _

  private val fieldTypes: Map[String, DataType] =
    fullSchema.fields.map(f => f.name -> f.dataType).toMap

  /** External-value extraction for filter evaluation. */
  private def extValue(obj: Map[String, JValue], attr: String): Any =
    obj.get(attr).map(jv => (jv, fieldTypes(attr)) match {
      case (JNull, _) => null
      case (JString(s), StringType) => s
      case (j, LongType) => j match {
        case JInt(i) => i.toLong
        case JLong(l) => l
        case JDouble(d) => d.toLong
        case JString(s) => s.toLong
        case _ => null
      }
      case (j, IntegerType) => j match {
        case JInt(i) => i.toInt
        case JLong(l) => l.toInt
        case JDouble(d) => d.toInt
        case JString(s) => s.toInt
        case _ => null
      }
      case (j, DoubleType) => j match {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case JLong(l) => l.toDouble
        case JDecimal(d) => d.toDouble
        case JString(s) => s.toDouble
        case _ => null
      }
      case (JBool(b), BooleanType) => b
      case (j, StringType) => JsonMethods.compact(JsonMethods.render(j))
      case _ => null
    }).orNull

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Long, y: Number) => Some(java.lang.Long.compare(x, y.longValue()))
    case (x: Int, y: Number) => Some(java.lang.Long.compare(x.toLong, y.longValue()))
    case (x: Double, y: Number) => Some(java.lang.Double.compare(x, y.doubleValue()))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case _ => None
  }

  private def eval(f: Filter, obj: Map[String, JValue]): Boolean = f match {
    case EqualTo(a, v) => cmp(extValue(obj, a), v).contains(0)
    case GreaterThan(a, v) => cmp(extValue(obj, a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(extValue(obj, a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(extValue(obj, a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(extValue(obj, a), v).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(extValue(obj, a), v).contains(0))
    case IsNotNull(a) => extValue(obj, a) != null
    case IsNull(a) => extValue(obj, a) == null
    case _ => true
  }

  private def toInternal(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (x: Long, LongType) => x
    case (x: Int, IntegerType) => x
    case (x: Double, DoubleType) => x
    case (x: Boolean, BooleanType) => x
    case (x, _) => throw new IllegalStateException(
      s"graft-jsonl cannot materialize $x as ${dt.sql}")
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      if (line.nonEmpty) {
        JsonMethods.parseOpt(line) match {
          case Some(JObject(fields)) =>
            val obj = fields.toMap
            if (filters.forall(eval(_, obj))) {
              current = new GenericInternalRow(required.fields.map { rf =>
                toInternal(extValue(obj, rf.name), rf.dataType)
              }.asInstanceOf[Array[Any]])
              return true
            }
          case _ => // skip malformed line (permissive, like the reference)
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = source.close()
}
