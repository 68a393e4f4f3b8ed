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

  // TPC-H Q4 shape (EXISTS decorrelated to a semi-join): late-shipment
  // proxy — the fixture has no l_commitdate/l_receiptdate
  private val existsQ4Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // TPC-H Q16 shape: NOT IN anti-join + COUNT(DISTINCT) per group
  private val notinQ16Sql =
    """SELECT p_brand, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  // TPC-H Q21 shape: correlated scalar MAX + EXISTS + NOT EXISTS on the
  // same fact table — the supplier who alone shipped last on
  // multi-supplier finished orders
  private val lateSupplierQ21Sql =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate = (SELECT max(l_shipdate) FROM lineitem l0
      |                       WHERE l0.l_orderkey = l1.l_orderkey)
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate >= l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  // explicit GROUPING SETS + grouping() markers (finer than the
  // rollup/cube queries: an arbitrary set list with a non-hierarchical
  // mix)
  private val groupingSetsSql =
    """SELECT n_name, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      |  CAST(grouping(n_name) AS BIGINT) AS g_n,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_p
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name),
      |                        (o_orderpriority), ())
      |ORDER BY g_n, g_p, n_name, o_orderpriority""".stripMargin

  // navigation window functions over a named WINDOW clause; lag/lead
  // pass doubles through untouched (bit-exact), ntile is total-ordered
  // by the unique o_orderkey tiebreak
  private val windowNavSql =
    """SELECT o_custkey, o_orderkey,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // TPC-H Q7 shape: two-nation volume by ship year — a 5-way join whose
  // disjunctive nation predicate defeats naive join-order heuristics
  private val q7VolumeSql =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |       AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice, l_discount
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |) shipping
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // TPC-H Q17 shape: correlated scalar aggregates over the fact table.
  // The 0.2*avg threshold is spelled as exact decimal cross-products
  // (qty * count * 5 < sum) — a float avg would differ by summation
  // order between engines and flip boundary rows
  private val q17AvgQtySql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |       / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3'
      |  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 *
      |      (SELECT CAST(count(*) AS DECIMAL(18,0)) FROM lineitem l2
      |       WHERE l2.l_partkey = p_partkey)
      |    < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l3
      |       WHERE l3.l_partkey = p_partkey)""".stripMargin

  // TPC-H Q18 shape: IN over a grouped HAVING subquery on the same fact
  // table (large-volume orders), then a 3-way join re-aggregation
  private val q18LargeOrdersSql =
    """SELECT c_name, c_custkey, o_orderkey,
      |  CAST(o_orderdate AS DATE) AS o_date, o_totalprice,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // TPC-H Q22 shape: global scalar-aggregate threshold + NOT EXISTS
  // anti-join (above-mean customers who never placed an urgent order —
  // every fixture customer has SOME order, so the anti-join targets the
  // urgent subset to stay data-driven). The mean is exact decimal
  // cross-products, not a float division
  private val q22IdleRichSql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
      |      (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0)
      |    > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3
      |       WHERE c3.c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, Q] = Map(
    "sql_q7_volume" -> ((s, dir) => withViews(s, dir)(q7VolumeSql)),
    "sql_q17_avg_qty" -> ((s, dir) => withViews(s, dir)(q17AvgQtySql)),
    "sql_q18_large_orders" -> ((s, dir) =>
      withViews(s, dir)(q18LargeOrdersSql)),
    "sql_q22_idle_rich" -> ((s, dir) => withViews(s, dir)(q22IdleRichSql)),
    "sql_scalar_subquery" -> ((s, dir) =>
      withViews(s, dir)(scalarSubquerySql)),
    "sql_in_subquery" -> ((s, dir) =>
      withViews(s, dir)(inSubquerySql)),
    "sql_q10_returns" -> ((s, dir) =>
      withViews(s, dir)(q10Sql)),
    "sql_exists_q4" -> ((s, dir) =>
      withViews(s, dir)(existsQ4Sql)),
    "sql_notin_q16" -> ((s, dir) =>
      withViews(s, dir)(notinQ16Sql)),
    "sql_late_supplier_q21" -> ((s, dir) =>
      withViews(s, dir)(lateSupplierQ21Sql)),
    "sql_grouping_sets" -> ((s, dir) =>
      withViews(s, dir)(groupingSetsSql)),
    "sql_window_nav" -> ((s, dir) =>
      withViews(s, dir)(windowNavSql))
  )

  val oracle: Map[String, String] = Map(
    "sql_q7_volume" -> q7VolumeSql,
    "sql_q17_avg_qty" -> q17AvgQtySql,
    "sql_q18_large_orders" -> q18LargeOrdersSql,
    "sql_q22_idle_rich" -> q22IdleRichSql,
    "sql_scalar_subquery" -> scalarSubquerySql,
    "sql_in_subquery" -> inSubquerySql,
    "sql_q10_returns" -> q10Sql,
    "sql_exists_q4" -> existsQ4Sql,
    "sql_notin_q16" -> notinQ16Sql,
    "sql_late_supplier_q21" -> lateSupplierQ21Sql,
    "sql_grouping_sets" -> groupingSetsSql,
    "sql_window_nav" -> windowNavSql
  )
}
