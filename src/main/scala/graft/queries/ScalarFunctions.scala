package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scalar function coverage (string/date/conditional) + CUBE, all
  * oracle-checked. Functions restricted to the shared Spark/DuckDB
  * dialect with identical semantics (e.g. no dayofweek — the engines
  * number weekdays differently; no double→string formatting).
  */
object ScalarFunctions {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.table(s, dir, name)

  val queries: Map[String, Q] = Map(
    "func_string" -> ((s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 1, 8).as("sub"),
        length(col("c_name")).cast("bigint").as("len"),
        concat(col("c_mktsegment"), lit("_"), col("c_name")).as("cat"),
        regexp_replace(col("c_name"), "[#]", "-").as("repl"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        reverse(col("c_mktsegment")).as("rev"),
        trim(lit("  x  ")).as("trimmed"))
        .orderBy("c_custkey")),

    "func_datetime" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"),
          lit("1995-01-01").cast("date")).cast("bigint").as("days_since"),
        (col("o_orderkey") % 2 === 0).as("even"))
        .orderBy("o_orderkey")),

    // CUBE: all 4 grouping combinations in one pass
    "cube_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first))
  )

  val oracle: Map[String, String] = Map(
    "func_string" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up,
        |  lower(c_mktsegment) AS lo,
        |  substring(c_name, 1, 8) AS sub,
        |  CAST(length(c_name) AS BIGINT) AS len,
        |  concat(c_mktsegment, '_', c_name) AS cat,
        |  regexp_replace(c_name, '[#]', '-', 'g') AS repl,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  reverse(c_mktsegment) AS rev,
        |  trim('  x  ') AS trimmed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "func_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  o_orderkey % 2 = 0 AS even
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  )
}
