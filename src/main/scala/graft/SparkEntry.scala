package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CurationOps, EmbeddingOps, IncrementalOps,
  MultimodalOps, ReferenceOps, Relational, ScalarFunctions, SqlSurface,
  TextOps, TimeSeriesOps, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's oracle-checked query;
  * `oracleSql` carries the DuckDB-equivalent SQL (same column names — the
  * driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceOps.queries ++ Relational.queries ++ TextOps.queries ++
      EmbeddingOps.queries ++ TimeSeriesOps.queries ++ SqlSurface.queries ++
      TpchShapes.queries ++ ScalarFunctions.queries ++ CurationOps.queries ++
      MultimodalOps.queries ++ IncrementalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceOps.oracle ++ Relational.oracle ++ TextOps.oracle ++
      EmbeddingOps.oracle ++ TimeSeriesOps.oracle ++ SqlSurface.oracle ++
      TpchShapes.oracle ++ ScalarFunctions.oracle ++ CurationOps.oracle ++
      MultimodalOps.oracle ++ IncrementalOps.oracle
}
