package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over an event stream — the
  * monitoring shape (is this value > z·σ from its recent history?)
  * as one per-key range window.
  *
  * Scale shape: the window partitions by KEY and ranges over a bounded
  * time span, so per-task state is one key's in-range rows — the same
  * bounded-window argument as sessionize/transitions (a global window
  * would funnel the stream through one task; a per-key bounded range
  * survives any corpus size with keys spread across tasks).
  *
  * Exactness contract (the gate's cross-engine requirement): the value
  * is floored onto a 1e-6 integer grid BEFORE any aggregation, history
  * sums and sums-of-squares accumulate in DECIMAL(38,0) (exact — no
  * float summation order anywhere), and the z²-threshold test is one
  * integer cross-multiplication,
  *
  *   (n·v − Σ)² · (n−1)  >  z² · (n·Σq − Σ²) · n
  *
  * which avoids division and sqrt entirely — the flag is bit-exact in
  * any engine. (The classical form compares (v−μ)/σ to z; multiply both
  * sides by n²·(n−1)·σ² to get the integer form.)
  *
  * History = the PRECEDING `rangeSeconds` window EXCLUDING the current
  * row (an outlier must not mask itself); rows with fewer than
  * `minHist` history points never flag (cold start).
  *
  * Magnitude bound: both cross-multiplied sides scale like
  * z² · n³ · (max|v|·10⁶)² for n = rows in one key's window, so
  * DECIMAL(38,0) holds while  n³ · (max|v|·10⁶)²  <  10³⁸ / z² —
  * at z = 3 and |v| ≤ 10³ that is n ≈ 2·10⁶ history rows PER KEY PER
  * WINDOW (not per corpus; keys are independent). Past the bound,
  * non-ANSI Spark turns decimal overflow into NULL, which would read
  * as "not flagged" — a silent false negative. Every overflowable
  * intermediate is therefore guarded: a NULL that cannot mean "empty
  * frame" or "null input" raises instead of un-flagging, so overflow
  * is an ERROR under any ANSI setting, matching the oracle engines
  * (DuckDB HUGEINT errors) instead of silently disagreeing with them.
  */
object Anomaly {

  def zscoreFlags(df: DataFrame, keyCol: String, tsCol: String,
                  valCol: String, rangeSeconds: Long = 21600L,
                  minHist: Int = 12, z: Int = 3): DataFrame = {
    val sec = col(tsCol).cast("long")
    // the [-range, -1] frame as a DIFFERENCE of two unbounded-preceding
    // running frames: Spark evaluates a bounded sliding RANGE frame by
    // recomputing the whole frame per row (sum has no retract), which is
    // O(rows × frame); running frames only ever ADD and are O(rows).
    // Exact integer subtraction — identical results (AnomalySpec + the
    // cross-engine oracle, which keeps the direct RANGE form).
    def upTo(off: Long) = Window.partitionBy(col(keyCol)).orderBy(sec)
      .rangeBetween(Window.unboundedPreceding, off)
    val recent = upTo(-1)
    val old = upTo(-(rangeSeconds + 1))
    val dec: Column => Column = _.cast("decimal(38,0)")
    val dz = lit(0).cast("decimal(38,0)")
    val vGrid = dec(floor(col(valCol) * lit(1e6)))
    // ALL eight running aggregates in ONE select: same partition/order
    // spec, two frames → Catalyst plans a single WindowExec (one sorted
    // pass). Spreading them across chained withColumns split the plan
    // into three WindowExec passes — measured 2× on the bench slot.
    val runs = df.select(col(keyCol), col(tsCol), col(valCol),
        vGrid.as("__v"))
      .select(col("*"),
        count(lit(1)).over(recent).as("__c_r"),
        count(lit(1)).over(old).as("__c_o"),
        count(col("__v")).over(recent).as("__k_r"),
        count(col("__v")).over(old).as("__k_o"),
        sum(col("__v")).over(recent).as("__s_r"),
        sum(col("__v")).over(old).as("__s_o"),
        sum(col("__v") * col("__v")).over(recent).as("__q_r"),
        sum(col("__v") * col("__v")).over(old).as("__q_o"))
    // overflow guard (see scaladoc): a running sum is NULL either because
    // the frame has no non-null value (count 0 — legitimate, becomes 0)
    // or because the DECIMAL(38,0) accumulator overflowed in non-ANSI
    // mode — the latter must ERROR, not silently un-flag
    def guarded(agg: Column, nonNullCnt: Column, what: String): Column =
      when(nonNullCnt > 0 && agg.isNull, raise_error(lit(
        s"Anomaly.zscoreFlags: DECIMAL(38,0) overflow in $what — " +
          "window exceeds the n³·(max|v|·1e6)² < 1e38/z² bound; " +
          "shrink rangeSeconds or rescale the value")))
        .otherwise(coalesce(agg, dz))
    val base = runs
      .withColumn("__n", col("__c_r") - col("__c_o"))
      .withColumn("__s",
        guarded(col("__s_r"), col("__k_r"), "sum(v) recent") -
          guarded(col("__s_o"), col("__k_o"), "sum(v) old"))
      .withColumn("__q",
        guarded(col("__q_r"), col("__k_r"), "sum(v²) recent") -
          guarded(col("__q_o"), col("__k_o"), "sum(v²) old"))
    val n = dec(col("__n"))
    val lhs = (n * col("__v") - col("__s")) *
      (n * col("__v") - col("__s")) * (n - lit(1))
    val rhs = lit(z * z) * (n * col("__q") - col("__s") * col("__s")) * n
    // products can overflow past the sums: __v/__s/__q non-null ⇒ a NULL
    // side can only be multiplication overflow
    def guardedSide(side: Column, what: String): Column =
      when(col("__v").isNotNull && side.isNull, raise_error(lit(
        s"Anomaly.zscoreFlags: DECIMAL(38,0) overflow in $what — " +
          "window exceeds the n³·(max|v|·1e6)² < 1e38/z² bound; " +
          "shrink rangeSeconds or rescale the value")))
        .otherwise(side)
    base
      .withColumn("flag", col("__n") >= minHist &&
        guardedSide(lhs, "lhs (n·v−Σ)²·(n−1)") >
        guardedSide(rhs, "rhs z²·(n·Σq−Σ²)·n"))
      .filter(col("flag"))
      .select(col(keyCol), col(tsCol), col(valCol),
        col("__n").as("n_hist"))
  }
}
