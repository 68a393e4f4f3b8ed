package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AsOf, Resample, Sessionize}

/** Time-series operators over the events stream: as-of join (oracled by
  * DuckDB's native ASOF LEFT JOIN) and gap sessionization (oracled by the
  * equivalent window SQL). Sketch-based approximations are rows-only.
  */
object TimeSeriesOps {

  type Q = (SparkSession, String) => DataFrame

  private def events(s: SparkSession, dir: String) =
    Tables.table(s, dir, "events")

  val queries: Map[String, Q] = Map(
    // for every event: the user's most recent purchase value as of then
    "asof_join" -> ((s, dir) => {
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      val purchases = events(s, dir)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      AsOf.asofJoin(ev, purchases, Seq("user_id"), "ts", "ts",
        Map("value" -> "last_purchase_value"))
        .select("event_id", "user_id", "last_purchase_value")
        .orderBy("event_id")
    }),

    // the same as-of join through the CUSTOM physical operator
    // (plans.AsOfJoinExec: clustered+sorted merge, no union/window) —
    // checked against the same DuckDB ASOF LEFT JOIN oracle
    "asof_join_exec" -> ((s, dir) => {
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      val purchases = events(s, dir)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      graft.plans.AsOfJoin.asofJoin(ev, purchases, Seq("user_id"), "ts", "ts",
        Map("value" -> "last_purchase_value"))
        .select("event_id", "user_id", "last_purchase_value")
        .orderBy("event_id")
    }),

    // 30-minute-gap sessions per user with rollups
    "sessionize" -> ((s, dir) =>
      Sessionize.sessionStats(
        events(s, dir).select("user_id", "ts", "event_id", "value"),
        Seq("user_id"), "ts", gapSeconds = 1800L, valueCol = "value",
        tieBreak = Seq("event_id"))
        .orderBy("user_id", "session_idx")),

    // point-in-range join through the CUSTOM sweep-merge operator
    // (plans.RangeJoinExec): every event attached to its containing
    // session window — each event lands in exactly one session, so the
    // output is deterministic and row-complete
    "range_join_exec" -> ((s, dir) => {
      val ev = events(s, dir).select("event_id", "user_id", "ts")
      val sessions = Sessionize.sessionStats(
        events(s, dir).select("user_id", "ts", "event_id", "value"),
        Seq("user_id"), "ts", gapSeconds = 1800L, valueCol = "value",
        tieBreak = Seq("event_id"))
        .select("user_id", "session_idx", "session_start", "session_end")
      graft.plans.RangeJoin.rangeJoin(ev, sessions, Seq("user_id"),
        "ts", "session_start", "session_end",
        Map("session_idx" -> "session_idx"))
        .select("event_id", "user_id", "session_idx")
        .orderBy("event_id")
    }),

    // approximate distinct (HLL++); rows-only — estimator differs from
    // DuckDB's, accuracy is asserted in ScalaTest against exact counts
    "approx_distinct" -> ((s, dir) =>
      events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // resample to an hourly grid with gap fill: per event_type, every
    // hour from its first to last event; empty hours carry the last
    // observed gauge forward (value passes through untouched — bit-exact)
    "resample_fill" -> ((s, dir) =>
      Resample.gridFill(events(s, dir), "event_type", "ts", "value",
        "event_id", unit = "hour")
        .orderBy("event_type", "bucket")),

    // mergeable DataSketches HLL per day (the at-scale rollup shape:
    // daily sketches union into monthly without rescanning); rows-only
    "hll_daily_users" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("user_id"))).as("est_users"),
          count(lit(1)).as("n"))
        .orderBy("day")),

    // rolling z-score anomaly detection (r11): per-type 6-hour history
    // windows, planted ~0.1% spikes (event_id % 997) so the flags are
    // data-driven at every SF. The z² test is one integer
    // cross-multiplication over DECIMAL(38,0) grid sums — no division,
    // no sqrt, no float accumulation — so the flag set is bit-exact
    // cross-engine (see operators.Anomaly).
    "anomaly_zscore" -> ((s, dir) => {
      val spiked = events(s, dir).withColumn("value",
        col("value") +
          when(col("event_id") % 997 === 0, lit(500.0)).otherwise(lit(0.0)))
      graft.operators.Anomaly.zscoreFlags(spiked, "event_type", "ts",
        "value", rangeSeconds = 21600L, minHist = 12, z = 3)
        .orderBy("event_type", "ts", "value")
    }),

    // mergeable KLL quantile sketches at PRODUCTION k=200, same
    // daily→monthly rollup shape. The raw estimates are randomized by
    // design (compaction coin flips + layout-dependent merge order make
    // them unpinnable — the one former no_oracle slot), so the query
    // surfaces what IS deterministic about the sketch: its contract.
    // Each estimated quantile's EXACT inclusive rank (count(value ≤ est),
    // recomputed against the raw events in the same job) must sit within
    // the k=200 normalized rank-error bound of its target — ScalaTest
    // pins ~1%, the gate asserts a comfortable 3% as exact integer
    // cross-multiplication. The booleans (and n, which re-checks the
    // daily/monthly counting) are layout-independent, so the row is
    // hash-green against a closed-form oracle: a broken serialize/merge/
    // rank path yields rank errors of tens of percent, not <3%. The
    // exact-regime twin below anchors the same path bit-exactly.
    "kll_value_quantiles" -> ((s, dir) => {
      import graft.functions.expressions.KllAggregate._
      val daily = events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(kll_sketch_agg(col("value")).as("sk"), count(lit(1)).as("n"))
      val est = daily.groupBy(col("event_type"))
        .agg(kll_merge_agg(col("sk")).as("sk"), sum(col("n")).as("n"))
        .select(col("event_type"), col("n"),
          kll_quantiles(col("sk"), Seq(0.5, 0.95, 0.99)).as("q"))
        .select(col("event_type"), col("n"),
          col("q")(0).as("p50"), col("q")(1).as("p95"), col("q")(2).as("p99"))
      // exact inclusive ranks of the three estimates, one events pass;
      // |rank/n − p| ≤ 0.03  ⟺  |100·rank − p%·n| ≤ 3·n  (exact ints)
      def ok(rank: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column, pPct: Int) =
        abs(rank * 100 - n * pPct) <= n * 3
      events(s, dir).select(col("event_type"), col("value"))
        .join(broadcast(est), Seq("event_type"))
        .groupBy("event_type")
        .agg(max(col("n")).as("n"),
          sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("r95"),
          sum(when(col("value") <= col("p99"), 1L).otherwise(0L)).as("r99"))
        .select(col("event_type"), col("n"),
          ok(col("r50"), col("n"), 50).as("p50_ok"),
          ok(col("r95"), col("n"), 95).as("p95_ok"),
          ok(col("r99"), col("n"), 99).as("p99_ok"))
        .orderBy("event_type")
    }),

    // the SAME daily→monthly KLL rollup in the sketch's EXACT regime
    // (r9): k = 32768 ≥ the per-group row count, so no compaction ever
    // fires, the sketch retains every value, and INCLUSIVE rank queries
    // are order statistics — which is precisely DuckDB's quantile_disc
    // (smallest x with cumulative rank ≥ p). This anchors the whole
    // sketch-aggregate path (partial agg, serialize, merge, rank query)
    // to a REAL closed-form oracle; the k=200 production query above
    // stays rows-only because randomized compaction is how its error
    // bound is proved. The 3-day window bounds the per-type group so
    // the exact regime holds at EVERY fixture scale the oracle could
    // run at (sf0.01: ~2e2/group, sf0.1: ~2e3, sf1: ~2e4 — all ≤ k;
    // the unbounded month at sf1 would be 2e5 and silently leave the
    // exact regime), while still merging 3 daily sketches per type.
    "kll_exact_quantiles" -> ((s, dir) => {
      import graft.functions.expressions.KllAggregate._
      val k = 32768
      val daily = events(s, dir)
        .filter(col("ts").cast("date") < lit("2024-01-04").cast("date"))
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(kll_sketch_agg(col("value"), k).as("sk"),
          count(lit(1)).as("n"))
      daily.groupBy(col("event_type"))
        .agg(kll_merge_agg(col("sk"), k).as("sk"), sum(col("n")).as("n"))
        .select(col("event_type"), col("n"),
          kll_quantiles(col("sk"), Seq(0.5, 0.95, 0.99)).as("q"))
        .select(col("event_type"), col("n"),
          col("q")(0).as("p50"), col("q")(1).as("p95"), col("q")(2).as("p99"))
        .orderBy("event_type")
    }),

    // theta sketches — the SET-OPERATION leg of the sketch family
    // (r9): daily per-type sketches union into monthly ones WITHOUT
    // rescanning (the HLL/KLL rollup shape), and then — what HLL cannot
    // do — two slices' sketches COMPOSE: users in click ∩ purchase
    // (conversion overlap), click \ purchase, and the all-types union,
    // at sketch cost rather than a distinct-join re-scan. All native
    // Spark 4 theta functions (no custom expression needed). lgK=18
    // keeps every sketch in its exact regime through ~sf10 fixtures
    // (≤ 262k distinct users), where estimates are exact counts and
    // DuckDB recomputes them closed-form with INTERSECT/EXCEPT — the
    // kll_exact_quantiles pattern applied to set algebra.
    "theta_user_overlap" -> ((s, dir) => {
      val lgK = 18
      val daily = events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(theta_sketch_agg(col("user_id"), lgK).as("sk"))
      // arbitrary SLICES re-aggregate from the stored daily sketches
      // (first-week clickers vs last-week purchasers) — no event re-scan;
      // day-bounded slices keep the cells discriminating (the fixture's
      // full-month slices all converge to the whole user base)
      val wk1Click = col("event_type") === "click" &&
        col("day") <= lit("2024-01-07").cast("date")
      val wk4Purchase = col("event_type") === "purchase" &&
        col("day") >= lit("2024-01-24").cast("date")
      daily.agg(
        theta_union_agg(when(wk1Click, col("sk")), lgK).as("c"),
        theta_union_agg(when(wk4Purchase, col("sk")), lgK).as("p"),
        theta_union_agg(col("sk"), lgK).as("all"))
        .select(
          theta_sketch_estimate(col("c")).cast("bigint")
            .as("early_click_users"),
          theta_sketch_estimate(col("p")).cast("bigint")
            .as("late_purchase_users"),
          theta_sketch_estimate(theta_intersection(col("c"), col("p")))
            .cast("bigint").as("both_users"),
          theta_sketch_estimate(theta_difference(col("c"), col("p")))
            .cast("bigint").as("click_only_users"),
          theta_sketch_estimate(col("all")).cast("bigint").as("all_users"))
    }),

    // ordered funnel (r10): view → click → purchase within 72 h of the
    // first view, per the classic conversion-window definition (step i
    // strictly after step i−1, within the window of step 1). Pure
    // user-partitioned relational algebra — REAL SQL oracle
    "funnel_conversion" -> ((s, dir) =>
      graft.operators.Funnel.conversion(events(s, dir), "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"),
        withinSeconds = 72 * 3600)
        .orderBy("step")),

    // cohort retention (r10): users by first-seen day × day offset of
    // later activity — the daily-retention matrix. REAL SQL oracle
    "cohort_retention" -> ((s, dir) =>
      graft.operators.Funnel.cohortRetention(events(s, dir), "user_id",
        "ts", maxOffsetDays = 31)
        .orderBy("cohort_day", "day_offset")),

    // first-order event-transition matrix (r10): per-user ts-ordered
    // lead pairs, row-normalized — user-partitioned window (bounded
    // state), exact integer cells + one division. REAL SQL oracle
    "event_transitions" -> ((s, dir) =>
      graft.operators.Funnel.transitionMatrix(events(s, dir), "user_id",
        "event_type", "ts", "event_id")
        .orderBy("cur", "nxt")),

    // Count–Min sketch (r10) — the POINT-FREQUENCY leg of the sketch
    // family: daily per-type CM(4×256) sketches over user ids, counter
    // tables summed daily→monthly WITHOUT rescanning, then per-user
    // frequency estimates for a probe set. NOT randomized (fixed
    // md5-derived hash rows), so the estimate — including its one-sided
    // collision inflation — has a CLOSED FORM the DuckDB oracle
    // recomputes cell by cell: hash-gated end-to-end, not pinned.
    "cms_user_freq" -> ((s, dir) => {
      import graft.functions.expressions.CountMinAggregate._
      val depth = 4; val width = 256
      val daily = events(s, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(cms_agg(col("user_id"), depth, width).as("sk"))
      val monthly = daily.groupBy(col("event_type"))
        .agg(cms_merge_agg(col("sk"), depth, width).as("sk"))
      val probes = s.range(0, 10).select(col("id").as("user_id"))
      monthly.crossJoin(broadcast(probes))
        .select(col("event_type"), col("user_id"),
          cms_estimate(col("sk"), col("user_id")).as("est"))
        .orderBy("event_type", "user_id")
    }),

    // bitmap distinct rollup (r9): the EXACT counterpart to the theta
    // sketch for bounded integer id spaces — native bucketed bitmaps
    // (4 KB per 32768-id bucket) built per (type, day, bucket),
    // OR-merged across days WITHOUT rescanning, counted per type, and
    // AND-merged across types for the exact click ∩ purchase overlap
    // (buckets present in only one type are excluded — an AND over one
    // row is not an intersection). Always exact at any scale; memory
    // is bounded by the id RANGE, not the row count — the trade against
    // theta's fixed-size-at-any-range sketches, which is why both
    // belong in the family.
    "bitmap_user_rollup" -> ((s, dir) => {
      val bucketed = events(s, dir).select(col("event_type"),
        col("ts").cast("date").as("day"),
        bitmap_bucket_number(col("user_id")).as("bkt"),
        bitmap_bit_position(col("user_id")).as("pos"))
      val daily = bucketed.groupBy("event_type", "day", "bkt")
        .agg(bitmap_construct_agg(col("pos")).as("bm"))
      val byType = daily.groupBy("event_type", "bkt")
        .agg(bitmap_or_agg(col("bm")).as("bm"))
      val perType = byType.groupBy("event_type")
        .agg(sum(bitmap_count(col("bm"))).as("n_users"))
      // the overlap row re-aggregates date SLICES from the stored daily
      // bitmaps (first-week clickers ∩ last-week purchasers) — the same
      // no-rescan slicing as theta_user_overlap, exact here
      val cSel = col("event_type") === "click" &&
        col("day") <= lit("2024-01-07").cast("date")
      val pSel = col("event_type") === "purchase" &&
        col("day") >= lit("2024-01-24").cast("date")
      val overlap = daily.filter(cSel || pSel)
        .withColumn("side", when(cSel, lit("c")).otherwise(lit("p")))
        .groupBy("side", "bkt").agg(bitmap_or_agg(col("bm")).as("bm"))
        .groupBy("bkt")
        .agg(bitmap_and_agg(col("bm")).as("bm"),
          count(lit(1)).as("k"))
        .filter(col("k") === 2)
        .agg(coalesce(sum(bitmap_count(col("bm"))), lit(0L))
          .as("n_users"))
        .select(lit("early_click_and_late_purchase").as("event_type"),
          col("n_users"))
      perType.unionByName(overlap).orderBy("event_type")
    }),

    // VARIANT schema-on-read (r9): heterogeneous JSON event payloads —
    // even events nest the id under $.payload.id, odd under $.pid —
    // unify through Spark 4's native open-type path (parse_json →
    // try_variant_get across both shapes, no upfront schema), then
    // aggregate typed values. The modern Spark-native take on the same
    // problem the mejson codec solves for the reference's BSON shapes.
    // Exact-integer output, DuckDB recomputes via json_extract.
    "variant_extract" -> ((s, dir) => {
      val js = when(col("event_id") % 2 === 0,
        concat(lit("{\"kind\":\"a\",\"payload\":{\"id\":"),
          col("user_id").cast("string"),
          lit("},\"t\":\""), col("event_type"), lit("\"}")))
        .otherwise(
          concat(lit("{\"kind\":\"b\",\"pid\":"),
            col("user_id").cast("string"),
            lit(",\"t\":\""), col("event_type"), lit("\"}")))
      events(s, dir)
        .select(parse_json(js).as("v"))
        .select(
          variant_get(col("v"), "$.t", "string").as("t"),
          coalesce(
            try_variant_get(col("v"), "$.payload.id", "bigint"),
            try_variant_get(col("v"), "$.pid", "bigint")).as("uid"),
          variant_get(col("v"), "$.kind", "string").as("kind"))
        .groupBy("t").agg(
          count(lit(1)).as("n"),
          sum(col("uid")).as("uid_sum"),
          count(when(col("kind") === "a", 1)).as("n_nested"))
        .orderBy("t")
    })
  )

  val oracle: Map[String, String] = Map(
    // Pinned-value oracles for the sketch queries (the embed_ivf_topk
    // pattern): both estimators are order-independent BY CONSTRUCTION —
    // HLL registers are max-merges over per-item hashes, so the estimate
    // depends only on the input SET, not partitioning or merge order —
    // and verified bit-identical across 4- and 32-core layouts. The pins
    // catch any regression in the aggregate path; accuracy-vs-exact
    // stays asserted in ScalaTest.
    "approx_distinct" ->
      """SELECT * FROM (VALUES
        |  ('click', CAST(151 AS BIGINT), CAST(2006 AS BIGINT)),
        |  ('error', 151, 2014), ('purchase', 151, 1981),
        |  ('signup', 151, 2017), ('view', 151, 1982))
        |AS t(event_type, approx_users, n)
        |ORDER BY event_type""".stripMargin,
    "hll_daily_users" ->
      """SELECT * FROM (VALUES
        |  (DATE '2024-01-01', CAST(134 AS BIGINT), CAST(364 AS BIGINT)),
        |  (DATE '2024-01-02', 138, 339), (DATE '2024-01-03', 128, 333),
        |  (DATE '2024-01-04', 136, 326), (DATE '2024-01-05', 132, 353),
        |  (DATE '2024-01-06', 129, 331), (DATE '2024-01-07', 125, 302),
        |  (DATE '2024-01-08', 135, 312), (DATE '2024-01-09', 136, 317),
        |  (DATE '2024-01-10', 133, 330), (DATE '2024-01-11', 132, 340),
        |  (DATE '2024-01-12', 135, 354), (DATE '2024-01-13', 141, 338),
        |  (DATE '2024-01-14', 131, 329), (DATE '2024-01-15', 129, 317),
        |  (DATE '2024-01-16', 130, 335), (DATE '2024-01-17', 135, 329),
        |  (DATE '2024-01-18', 138, 356), (DATE '2024-01-19', 133, 323),
        |  (DATE '2024-01-20', 136, 354), (DATE '2024-01-21', 134, 314),
        |  (DATE '2024-01-22', 131, 339), (DATE '2024-01-23', 135, 334),
        |  (DATE '2024-01-24', 135, 325), (DATE '2024-01-25', 137, 345),
        |  (DATE '2024-01-26', 131, 326), (DATE '2024-01-27', 140, 341),
        |  (DATE '2024-01-28', 129, 320), (DATE '2024-01-29', 135, 345),
        |  (DATE '2024-01-30', 133, 329))
        |AS t(day, est_users, n)
        |ORDER BY day""".stripMargin,
    "asof_join" ->
      """SELECT e.event_id, e.user_id, p.value AS last_purchase_value
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |                WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "asof_join_exec" ->
      """SELECT e.event_id, e.user_id, p.value AS last_purchase_value
        |FROM events e
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |                WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "range_join_exec" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 0
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s2 AS (
        |  SELECT *, CAST(SUM(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |), sess AS (
        |  SELECT user_id, session_idx,
        |    MIN(ts) AS session_start, MAX(ts) AS session_end
        |  FROM s2 GROUP BY user_id, session_idx
        |)
        |SELECT e.event_id, e.user_id, sess.session_idx
        |FROM events e JOIN sess
        |  ON e.user_id = sess.user_id
        | AND e.ts >= sess.session_start AND e.ts <= sess.session_end
        |ORDER BY e.event_id""".stripMargin,
    // the arg_max HUGEINT key is (epoch_us(ts), event_id) lexicographic —
    // identical ordering to Spark's max_by(value, struct(ts, event_id))
    // for any event_id < 1e8
    "resample_fill" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         arg_max(value,
        |           CAST(epoch_us(ts) AS HUGEINT) * 100000000 + event_id) AS last_value
        |  FROM events GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 hour)) AS bucket
        |  FROM b GROUP BY event_type
        |)
        |SELECT g.event_type, g.bucket,
        |  COALESCE(b.n_events, 0) AS n_events,
        |  last_value(b.last_value IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.bucket
        |    ROWS UNBOUNDED PRECEDING) AS gauge,
        |  b.n_events IS NULL AS is_gap
        |FROM g LEFT JOIN b USING (event_type, bucket)
        |ORDER BY event_type, bucket""".stripMargin,
    "sessionize" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 0
        |         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s2 AS (
        |  SELECT *, CAST(SUM(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM s
        |)
        |SELECT user_id, session_idx,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS value_sum
        |FROM s2 GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    // anomaly_zscore — REAL closed form: the same grid values, HUGEINT
    // window sums, and integer z² cross-multiplication
    "anomaly_zscore" ->
      """WITH e AS (
        |  SELECT event_type, ts,
        |    value + CASE WHEN event_id % 997 = 0 THEN 500.0 ELSE 0.0 END
        |      AS value
        |  FROM events
        |), g AS (
        |  SELECT event_type, ts, value,
        |    CAST(floor(value * 1e6) AS HUGEINT) AS v,
        |    CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ep
        |  FROM e
        |), w AS (
        |  SELECT event_type, ts, value, v,
        |    COUNT(*) OVER win AS n,
        |    SUM(v) OVER win AS s,
        |    SUM(v * v) OVER win AS q
        |  FROM g
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ep
        |                 RANGE BETWEEN 21600 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, ts, value, CAST(n AS BIGINT) AS n_hist
        |FROM w
        |WHERE n >= 12
        |  AND (n*v - s) * (n*v - s) * (n - 1) > 9 * (n*q - s*s) * n
        |ORDER BY event_type, ts, value""".stripMargin,
    // kll_value_quantiles — the production-k slot's oracle checks the
    // sketch CONTRACT, not the randomized estimates: n per type must
    // match, and every estimated quantile's exact inclusive rank must
    // sit within the 3% bound (TRUE on the oracle side; the Spark side
    // recomputes the ranks against the raw events). See the query
    // scaladoc — this closed the last no_oracle gate row (r11).
    "kll_value_quantiles" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // kll_exact_quantiles — REAL closed form: in the exact regime the
    // sketch's INCLUSIVE rank query IS quantile_disc (smallest x with
    // cumulative rank ≥ p), so DuckDB recomputes the same order
    // statistics from the raw values
    "kll_exact_quantiles" ->
      """SELECT event_type, count(*) AS n,
        |  quantile_disc(value, 0.5)  AS p50,
        |  quantile_disc(value, 0.95) AS p95,
        |  quantile_disc(value, 0.99) AS p99
        |FROM events
        |WHERE CAST(ts AS DATE) < DATE '2024-01-04'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // theta_user_overlap — REAL closed form: in the exact regime the
    // sketch set algebra IS set algebra, so DuckDB recomputes every
    // cell with DISTINCT / INTERSECT / EXCEPT
    "theta_user_overlap" ->
      """WITH c AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'click'
        |    AND CAST(ts AS DATE) <= DATE '2024-01-07'
        |), p AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase'
        |    AND CAST(ts AS DATE) >= DATE '2024-01-24'
        |)
        |SELECT
        |  (SELECT count(*) FROM c) AS early_click_users,
        |  (SELECT count(*) FROM p) AS late_purchase_users,
        |  (SELECT count(*) FROM (SELECT * FROM c INTERSECT
        |                         SELECT * FROM p)) AS both_users,
        |  (SELECT count(*) FROM (SELECT * FROM c EXCEPT
        |                         SELECT * FROM p)) AS click_only_users,
        |  (SELECT count(DISTINCT user_id) FROM events) AS all_users"""
        .stripMargin,
    // funnel_conversion — REAL closed form: the same step-fold in SQL
    // (t1 = first view; t2 = first click after t1 within 72 h of t1;
    // t3 = first purchase after t2 within 72 h of t1)
    "funnel_conversion" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, s1.t1, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 72 HOUR
        |  GROUP BY e.user_id, s1.t1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        |    AND e.ts <= s2.t1 + INTERVAL 72 HOUR
        |  GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS step_name,
        |         (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY step""".stripMargin,
    // cohort_retention — REAL closed form: first-seen day per user,
    // distinct active days joined back, datediff bucket counts
    "cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT f.cohort_day, datediff('day', f.cohort_day, a.day)
        |    AS day_offset, count(*) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |WHERE datediff('day', f.cohort_day, a.day) <= 31
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // event_transitions — REAL closed form: same lead-over-(ts, id)
    // sequence; n and row totals are exact integers, p one division
    "event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |pairs AS (
        |  SELECT cur, nxt, count(*) AS n FROM seq
        |  WHERE nxt IS NOT NULL GROUP BY cur, nxt),
        |tot AS (SELECT cur, sum(n) AS row_n FROM pairs GROUP BY cur)
        |SELECT p.cur, p.nxt, p.n,
        |       CAST(p.n AS DOUBLE) / CAST(t.row_n AS DOUBLE) AS p
        |FROM pairs p JOIN tot t USING (cur)
        |ORDER BY cur, nxt""".stripMargin,
    // cms_user_freq — REAL closed form: the CM estimate is
    // min_i Σ counts of keys sharing row i's cell with the probe key.
    // The row hash is md5-derived (bucket = first 56 bits mod 256 =
    // hex chars 13–14 of md5("i:" || key)), so DuckDB rebuilds every
    // cell exactly — collisions, inflation and all.
    "cms_user_freq" -> {
      val bkt = (key: String) =>
        s"""((strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || ':' || $key), 13, 1)) - 1) * 16
           | + (strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR) || ':' || $key), 14, 1)) - 1))""".stripMargin
      s"""WITH actual AS (
         |  SELECT event_type, CAST(user_id AS VARCHAR) AS key, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |hrows AS (SELECT i FROM (VALUES (0),(1),(2),(3)) AS r(i)),
         |cells AS (
         |  SELECT event_type, i, ${bkt("key")} AS bkt,
         |         CAST(sum(n) AS BIGINT) AS cnt
         |  FROM actual CROSS JOIN hrows GROUP BY 1, 2, 3),
         |probes AS (
         |  SELECT CAST(u AS BIGINT) AS user_id, CAST(u AS VARCHAR) AS key
         |  FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9)) AS p(u)),
         |pcells AS (
         |  SELECT user_id, i, ${bkt("key")} AS bkt
         |  FROM probes CROSS JOIN hrows),
         |types AS (SELECT DISTINCT event_type FROM events)
         |SELECT t.event_type, pc.user_id,
         |       CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS est
         |FROM types t CROSS JOIN pcells pc
         |LEFT JOIN cells c
         |  ON c.event_type = t.event_type AND c.i = pc.i AND c.bkt = pc.bkt
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // bitmap_user_rollup — REAL closed form: bitmaps are exact, so
    // every cell is a plain DISTINCT / INTERSECT count
    "bitmap_user_rollup" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS n_users
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'early_click_and_late_purchase',
        |  CAST((SELECT count(*) FROM (
        |    SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'click'
        |      AND CAST(ts AS DATE) <= DATE '2024-01-07'
        |    INTERSECT
        |    SELECT DISTINCT user_id FROM events
        |    WHERE event_type = 'purchase'
        |      AND CAST(ts AS DATE) >= DATE '2024-01-24')) AS BIGINT)
        |ORDER BY event_type""".stripMargin,
    // variant_extract — REAL closed form: DuckDB builds the same
    // heterogeneous JSON strings and extracts with json paths
    "variant_extract" ->
      """WITH j AS (
        |  SELECT CASE WHEN event_id % 2 = 0
        |    THEN '{"kind":"a","payload":{"id":' || CAST(user_id AS VARCHAR)
        |         || '},"t":"' || event_type || '"}'
        |    ELSE '{"kind":"b","pid":' || CAST(user_id AS VARCHAR)
        |         || ',"t":"' || event_type || '"}' END AS js
        |  FROM events
        |)
        |SELECT json_extract_string(js, '$.t') AS t,
        |  count(*) AS n,
        |  CAST(SUM(COALESCE(CAST(json_extract(js, '$.payload.id') AS BIGINT),
        |               CAST(json_extract(js, '$.pid') AS BIGINT)))
        |    AS BIGINT) AS uid_sum,
        |  count(*) FILTER (json_extract_string(js, '$.kind') = 'a')
        |    AS n_nested
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
