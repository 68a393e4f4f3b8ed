package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** The remaining TPC-H planner shapes (Q2/Q6/Q8/Q9/Q11/Q12/Q13/Q14/Q15/
  * Q19/Q20), completing all 22 against the fixture schema. Together with
  * [[SqlSurface]] (Q4/Q7/Q10/Q16/Q17/Q18/Q21/Q22 + subquery/window/
  * grouping-set probes) and [[Relational]] (Q1/Q3/Q5), every TPC-H join/
  * subquery topology Catalyst distinguishes is covered and oracle-checked.
  *
  * The fixture has no `partsupp`, `ps_supplycost`, `l_shipmode`,
  * `p_container` or `l_commitdate`; shapes that need them are adapted the
  * way SqlSurface adapted Q4/Q21/Q22: the part↔supplier link comes from
  * observed `lineitem` pairs, supply cost from `p_retailprice`, ship modes
  * from `o_orderpriority` classes. What is preserved is the PLAN topology
  * (correlated agg with its own multi-join for Q2, CTE-reused-twice for
  * Q15, disjunction-of-conjunctions pushdown for Q19, grouped-HAVING IN
  * for Q20, global-threshold HAVING for Q11, outer-join count histogram
  * for Q13) — the property the planner is graded on, not the literal
  * TPC-H predicate constants.
  *
  * Money math follows the repo-wide oracle rule: exact DECIMAL until one
  * final CAST AS DOUBLE; ratios divide two already-cast doubles (same
  * IEEE-754 op on both engines); thresholds compare integer-scaled
  * decimals, never float fractions.
  */
object TpchShapes {

  type Q = (SparkSession, String) => DataFrame

  private def withViews(s: SparkSession, dir: String)(sql: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation", "region", "supplier",
      "part").foreach { t =>
      Tables.table(s, dir, t).createOrReplaceTempView(t)
    }
    s.sql(sql)
  }

  // Q2: correlated aggregate whose subquery repeats the outer's multi-join
  // (region-constrained best-supplier-per-part). partsupp is modeled by
  // the distinct (l_partkey, l_suppkey) pairs; min supply cost by max
  // account balance. GROUP BY collapses the many lineitems per pair.
  private val q2Sql =
    """SELECT s_acctbal, s_name, n_name, p_partkey, p_type
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE' AND p_size = 15
      |  AND s_acctbal = (SELECT MAX(s2.s_acctbal)
      |                   FROM supplier s2, lineitem l2, nation n2, region r2
      |                   WHERE l2.l_partkey = p_partkey
      |                     AND s2.s_suppkey = l2.l_suppkey
      |                     AND s2.s_nationkey = n2.n_nationkey
      |                     AND n2.n_regionkey = r2.r_regionkey
      |                     AND r2.r_name = 'EUROPE')
      |GROUP BY s_acctbal, s_name, n_name, p_partkey, p_type
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // Q6: the classic full-pushdown probe — every predicate must reach the
  // parquet scan; the agg is a single partial-final sum
  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // Q8: 8-table join, market share as a ratio of conditional over total
  // volume per year. The CASE carries no ELSE: SUM ignores nulls and both
  // engines agree on an all-null group, keeping the branch type-stable
  private val q8Sql =
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE)
      |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
      |      AS volume,
      |    n1.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region ON n2.n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |) all_nations
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  // Q9: profit by nation and year with a LIKE part filter; supply cost
  // modeled as 20% of retail value (p_retailprice has ≤1 decimal, so the
  // DOUBLE→DECIMAL cast is exact, never a rounding tie)
  private val q9Sql =
    """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
      |      - CAST(p_retailprice AS DECIMAL(12,2)) *
      |        CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.2 AS DECIMAL(3,2))
      |      AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%red%'
      |) profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  // Q11: grouped value vs a fraction of the global total — the HAVING
  // compares integer-scaled exact decimals (×500 ≈ the 0.2% fraction),
  // never a float threshold
  private val q11Sql =
    """SELECT l_partkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS part_value
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_5'
      |GROUP BY l_partkey
      |HAVING SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |           CAST(l_quantity AS DECIMAL(12,2))) * 500 >
      |  (SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |              CAST(l_quantity AS DECIMAL(12,2)))
      |   FROM lineitem
      |   JOIN supplier ON l_suppkey = s_suppkey
      |   JOIN nation ON s_nationkey = n_nationkey
      |   WHERE n_name = 'NATION_5')
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  // Q12: conditional counts per class (ship modes modeled by the order
  // priority split the fixture carries)
  private val q12Sql =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Q13: customer order-count distribution through a LEFT OUTER join with
  // an extra ON predicate (the join must stay outer — pushing the filter
  // below it would drop zero-order customers)
  private val q13Sql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // Q14: promo revenue share — the fixture's p_type carries a literal
  // 'PROMO' class; both sums are exact decimal, divided as doubles
  private val q14Sql =
    """SELECT CAST(100 AS DOUBLE) *
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |                THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
      |                     (CAST(1 AS DECIMAL(12,2)) -
      |                      CAST(l_discount AS DECIMAL(12,2))) END)
      |       AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             (CAST(1 AS DECIMAL(12,2)) -
      |              CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
      |  AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin

  // Q15: a CTE consumed twice (join input + scalar MAX) — Catalyst must
  // either reuse the subplan or recompute it consistently; the equality
  // compares exact decimals
  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
      |      AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // Q19: OR-of-ANDs across both join sides — the planner should still
  // derive the common p_partkey join and push the per-branch residuals
  private val q19Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |             (CAST(1 AS DECIMAL(12,2)) -
      |              CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin

  // Q20: IN over a grouped-HAVING subquery with a LIKE'd join inside —
  // the excess-quantity supplier shape
  private val q20Sql =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE p_name LIKE 'small%'
      |      AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |    GROUP BY l_suppkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100)
      |ORDER BY s_name""".stripMargin

  private val all: Map[String, String] = Map(
    "sql_q2_best_supplier" -> q2Sql,
    "sql_q6_forecast" -> q6Sql,
    "sql_q8_market_share" -> q8Sql,
    "sql_q9_profit" -> q9Sql,
    "sql_q11_top_value" -> q11Sql,
    "sql_q12_priority_class" -> q12Sql,
    "sql_q13_custdist" -> q13Sql,
    "sql_q14_promo" -> q14Sql,
    "sql_q15_top_supplier" -> q15Sql,
    "sql_q19_disjunctive" -> q19Sql,
    "sql_q20_qty_suppliers" -> q20Sql)

  val queries: Map[String, Q] =
    all.map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) => withViews(s, dir)(sql))
    }

  val oracle: Map[String, String] = all
}
