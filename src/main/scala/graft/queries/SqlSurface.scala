package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** Queries submitted through the SQL string interface (`spark.sql`) over
  * registered temp views — the engine's second query surface. Shapes chosen
  * to exercise Catalyst's subquery machinery: scalar correlated subqueries
  * (decorrelated into aggregated joins), IN-subqueries, and a TPC-H
  * Q10-style multi-join top-k. Identical SQL runs on DuckDB as the oracle.
  */
object SqlSurface {

  type Q = (SparkSession, String) => DataFrame

  private def withViews(s: SparkSession, dir: String)(sql: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation", "region", "supplier",
      "part", "events").foreach { t =>
      Tables.table(s, dir, t).createOrReplaceTempView(t)
    }
    s.sql(sql)
  }

  // shared SQL text: runnable verbatim by both Spark and DuckDB
  private val scalarSubquerySql =
    """SELECT c_custkey, c_name,
      |  (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders
      |   WHERE o_custkey = c_custkey) AS max_order
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  private val inSubquerySql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'MACHINERY')
      |  AND o_orderstatus = 'F'
      |ORDER BY o_orderkey""".stripMargin

  private val q10Sql =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |       AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) DESC,
      |         c_custkey
      |LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "sql_scalar_subquery" -> ((s, dir) =>
      withViews(s, dir)(scalarSubquerySql)),
    "sql_in_subquery" -> ((s, dir) =>
      withViews(s, dir)(inSubquerySql)),
    "sql_q10_returns" -> ((s, dir) =>
      withViews(s, dir)(q10Sql))
  )

  val oracle: Map[String, String] = Map(
    "sql_scalar_subquery" -> scalarSubquerySql,
    "sql_in_subquery" -> inSubquerySql,
    "sql_q10_returns" -> q10Sql
  )
}
