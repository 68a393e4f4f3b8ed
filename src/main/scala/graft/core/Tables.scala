package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-provided parquet fixtures plus generic helpers for
  * reading "namespace" tables. A namespace (reference: `message/message.go:69-77`,
  * one string key per table/collection/queue) maps to one parquet table here.
  *
  * Scale note: these readers are plain `spark.read.parquet` scans so Catalyst
  * keeps partition pruning, predicate pushdown and column pruning. Nothing is
  * cached or collected at read time; a 100 TB table is just more input splits.
  */
object Tables {

  /** All driver fixture table names (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one namespace table from a scale-factor dir.
    *
    * Timestamp note: `events.ts` is nanosecond-precision parquet, which
    * Spark 4 only reads with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (as a BIGINT of nanos). DuckDB — the oracle — truncates ns → µs on
    * read, so we apply the identical truncation here and expose a proper
    * TIMESTAMP column. All sessions in this repo set that conf.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNanos(spark.read.parquet(s"$dir/$name.parquet"))

  /** Convert any BIGINT column that parquet declared as TIMESTAMP(NANOS)
    * into a µs-truncated TimestampType column (matches DuckDB's read). */
  def normalizeNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    df.schema.fields
      .filter(f => f.name == "ts" && f.dataType == LongType)
      .foldLeft(df) { (d, f) =>
        d.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
      }
  }

  /** Multi-table tagged union: each table becomes rows tagged with an `ns`
    * column, projected to a common (ns, key, name) shape. This mirrors the
    * reference's channel-interleaved multi-table read
    * (`adaptor/postgres/reader.go:40-54`) as a `unionByName` of tagged scans.
    *
    * Column pruning still reaches each parquet scan because the projection is
    * declared before the union.
    */
  def taggedUnion(spark: SparkSession, dir: String,
                  tables: Seq[(String, String, String)]): DataFrame = {
    // tables: (name, keyCol, labelCol)
    tables.map { case (name, keyCol, labelCol) =>
      table(spark, dir, name).select(
        lit(name).as("ns"),
        col(keyCol).cast("bigint").as("key"),
        col(labelCol).cast("string").as("name"))
    }.reduce(_.unionByName(_))
  }
}
