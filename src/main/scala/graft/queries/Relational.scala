package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational suite beyond the reference's own surface (SURVEY §2.6 notes the
  * reference has no joins/aggs/windows — Spark provides them; these queries
  * are the engine's general-query capability and the bench headliners).
  *
  * Numeric policy for cross-engine hash equality: all money arithmetic runs
  * in DECIMAL (exact, associative — safe under Spark's unordered partial
  * aggregation) and is cast to DOUBLE only in the final projection. Plain
  * parquet doubles are only ever compared/min-maxed (exact), never summed.
  *
  * Scale notes per query are inline: what shuffles, what broadcasts, what
  * AQE is expected to do at 1000 executors.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.table(s, dir, name)

  private val dec = "DECIMAL(12,2)"
  // decimal revenue term: exact in both engines
  private val revenueExpr =
    s"CAST(l_extendedprice AS $dec) * (CAST(1 AS $dec) - CAST(l_discount AS $dec))"

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: single scan, map-side partial agg, 6-group result.
    // At scale: one shuffle of ~|groups| rows after partial agg; filter and
    // 7-column projection push to the parquet scan.
    "q1_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr(s"CAST(SUM(CAST(l_quantity AS $dec)) AS DOUBLE)").as("sum_qty"),
          expr(s"CAST(SUM(CAST(l_extendedprice AS $dec)) AS DOUBLE)").as("sum_base_price"),
          expr(s"CAST(SUM($revenueExpr) AS DOUBLE)").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem. customer is small →
    // broadcast; orders⋈lineitem shuffles on orderkey. Top-10 by exact
    // decimal revenue with key tie-break.
    "q3_topk" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), expr(revenueExpr).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(col("rev")).as("revd"))
        .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
          col("revd").cast("double").as("revenue"), col("revd"))
        .orderBy(col("revd").desc, col("l_orderkey"))
        .limit(10)
        .drop("revd")
    }),

    // TPC-H Q5 shape: 6-way join; region/nation/supplier/customer are dims →
    // broadcast; the lineitem⋈orders join shuffles on orderkey.
    "q5_region_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), expr(revenueExpr).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(col("rev")).as("revd"))
        .select(col("n_name"), col("revd").cast("double").as("revenue"), col("revd"))
        .orderBy(col("revd").desc, col("n_name"))
        .drop("revd")
    }),

    // distinct aggregation: two-phase (partial distinct then global) —
    // Catalyst expands COUNT(DISTINCT) automatically.
    "distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // two-phase salted aggregation (r9 gate surface for operators.Skew):
    // a hot key spread over 16 salt buckets then merged must equal the
    // plain GROUP BY — decimal-exact sums make the equality bit-exact.
    // l_returnflag has 3 values over 600k rows at sf0.1: exactly the
    // hot-key-with-large-fanin shape the salt exists for
    "skew_salted_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("decimal(12,2)").as("q"))
      graft.operators.Skew.saltedSumCount(li, Seq("l_returnflag"), "q",
          buckets = 16)
        .select(col("l_returnflag"),
          expr("CAST(total AS DOUBLE)").as("total"), col("n"))
        .orderBy("l_returnflag")
    }),

    // window function: top-3 customers per segment by balance. One shuffle
    // on the partition key; doubles only compared, never summed.
    "window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_mktsegment", "rn", "c_custkey", "c_name", "c_acctbal")
        .orderBy("c_mktsegment", "rn")
    }),

    // exact interpolated quantiles per group (sort-based aggregate; at
    // scale this is the one agg that buffers its group — use
    // approx_percentile when |group| is unbounded). Also percent_rank:
    // exact (rank-1)/(n-1) integer-derived division.
    "quantile_stats" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("double").as("q"))
        .groupBy("l_returnflag")
        .agg(
          percentile(col("q"), lit(0.5)).as("median_qty"),
          percentile(col("q"), lit(0.9)).as("p90_qty"),
          min("q").as("min_qty"), max("q").as("max_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "window_percent_rank" -> ((s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(Window.partitionBy("c_mktsegment")
            .orderBy(col("c_acctbal"), col("c_custkey"))).as("pr"))
        .orderBy("c_mktsegment", "c_custkey")),

    // running / cumulative window over time per user (frame-based window)
    "window_running" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(value AS DECIMAL(14,2))").as("v"))
        .withColumn("running_sum", sum(col("v")).over(w).cast("double"))
        .withColumn("running_n", count(lit(1)).over(w))
        .select("user_id", "event_id", "running_sum", "running_n")
        .orderBy("user_id", "event_id")
    }),

    // global top-k sort: Spark plans TakeOrderedAndProject — per-partition
    // heap + driver merge of k rows, no full sort at scale.
    "sort_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)),

    // set ops (SURVEY §2.6: reference has none; unions are its only
    // multi-table op). INTERSECT/EXCEPT plan as distinct + semi/anti join.
    "set_intersect" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .intersect(t(s, dir, "orders").select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),
    "set_except" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")),

    // semi/anti joins (EXISTS / NOT EXISTS)
    "join_semi" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),
    "join_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
            .filter(col("o_orderstatus") === "F").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // hierarchical totals: ROLLUP produces (flag, status), (flag), ()
    // levels in one pass — Catalyst expands then aggregates once
    "rollup_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          expr(s"CAST(SUM(CAST(l_quantity AS $dec)) AS DOUBLE)").as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // TPC-H Q13 shape: LEFT outer join + two-level aggregation
    // (orders-per-customer histogram, including zero-order customers)
    "orders_histogram" -> ((s, dir) => {
      val perCust = t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("n_custs"))
        .orderBy(col("n_custs").desc, col("c_count").desc)
    }),

    // aggregation filter (HAVING)
    "having_agg" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)")
            .as("spend"))
        .filter(col("n_orders") >= 15)
        .orderBy("o_custkey")),

    // conditional aggregation (pivot by event type in one scan)
    "pivot_events" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("clicks"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("views"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
          expr("CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(14,2)) ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)")
            .as("purchase_value"))
        .orderBy("user_id")),

    // event-time tumbling window aggregation (batch form of the streaming
    // windowed agg; date_trunc is the window assignment)
    "time_window_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE)").as("total"))
        .orderBy("hour", "event_type"))
  )

  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  val oracle: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($revenueSql) AS DOUBLE) AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |       CAST(SUM($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY SUM($revenueSql) DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(SUM($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY SUM($revenueSql) DESC, n_name""".stripMargin,
    "distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the salted two-phase aggregate must equal the plain GROUP BY
    "skew_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "window_rank" ->
      """SELECT c_mktsegment, rn, c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "quantile_stats" ->
      """SELECT l_returnflag,
        |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS median_qty,
        |  quantile_cont(CAST(l_quantity AS DOUBLE), 0.9) AS p90_qty,
        |  MIN(CAST(l_quantity AS DOUBLE)) AS min_qty,
        |  MAX(CAST(l_quantity AS DOUBLE)) AS max_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "window_percent_rank" ->
      """SELECT c_custkey, c_mktsegment,
        |  percent_rank() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS pr
        |FROM customer WHERE c_custkey <= 200
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "window_running" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
        |  COUNT(*) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "sort_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
        |INTERSECT SELECT o_custkey FROM orders ORDER BY custkey""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "orders_histogram" ->
      """SELECT c_count, COUNT(*) AS n_custs FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY n_custs DESC, c_count DESC""".stripMargin,
    "having_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
        |ORDER BY o_custkey""".stripMargin,
    "pivot_events" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(14,2))
        |           ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "time_window_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin
  )
}
