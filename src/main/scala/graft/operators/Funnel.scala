package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream: ordered-funnel
  * conversion and cohort retention — the two queries every large-scale
  * event pipeline runs daily.
  *
  * Both are pure relational compositions (groupBy + equi-joins on the
  * user key), so at 100 TB they hash-partition by user and never see a
  * window funnel or a driver loop; every comparison is timestamp/integer
  * arithmetic, exactly reproducible in any engine — REAL SQL oracles,
  * no pins.
  */
object Funnel {

  /** Ordered funnel: step 1's time is a user's FIRST step-1 event; step
    * i's time is the first step-i event STRICTLY AFTER step i−1's time
    * and within `withinSeconds` of step 1's time (the classic
    * conversion-window definition). Returns one row per step:
    * (step, step_name, n_users), n_users non-increasing.
    *
    * One groupBy per step plus an equi-join on the user key per step —
    * steps are few and fixed, so the plan is a short chain of
    * user-partitioned aggregations. */
  def conversion(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], withinSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)

    // per-step reached table (user, t_1, t_i), folded left over steps;
    // all steps union into ONE job — no per-step driver action
    val reachedTables = steps.zipWithIndex.drop(1)
      .scanLeft(events.filter(col(typeCol) === steps.head)
        .groupBy(u.as("__user"))
        .agg(min(col(tsCol)).as("__t"))
        .withColumn("__t1", col("__t"))) { case (prev, (step, _)) =>
        events.filter(col(typeCol) === step)
          .select(u.as("__user"), col(tsCol).as("__ts"))
          .join(prev, Seq("__user"))
          .filter(col("__ts") > col("__t") &&
            col("__ts") <= col("__t1") +
              expr(s"INTERVAL $withinSeconds SECONDS"))
          .groupBy(col("__user"), col("__t1"))
          .agg(min(col("__ts")).as("__t"))
      }
    reachedTables.zip(steps).zipWithIndex
      .map { case ((df, step), i) =>
        df.select(lit(i + 1).as("step"), lit(step).as("step_name"),
          col("__user"))
      }
      .reduce(_.unionByName(_))
      .groupBy("step", "step_name")
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order event-transition (Markov) matrix: for each user's
    * ts-ordered event sequence, count (current → next) type pairs and
    * derive row-normalized transition probabilities. The lead() window
    * is partitioned by USER (bounded state per key — the one window
    * shape that scales; ties broken by the id column so the sequence is
    * deterministic). p = n / Σ_row n is one integer division per cell —
    * exact in any engine. */
  def transitionMatrix(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("cur"),
        lead(col(typeCol), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt")
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("cur").agg(sum(col("n")).as("row_n"))
    pairs.join(broadcast(totals), Seq("cur"))
      .select(col("cur"), col("nxt"), col("n"),
        (col("n").cast("double") / col("row_n").cast("double")).as("p"))
  }

  /** Cohort retention matrix: a user's cohort is the day of their first
    * event; cell (cohort_day, day_offset) counts distinct cohort users
    * active day_offset days later. Returns
    * (cohort_day, day_offset, n_users), offset 0 = cohort size.
    *
    * Two user-partitioned aggregations and one equi-join — the whole
    * matrix in three shuffles regardless of corpus size. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String, maxOffsetDays: Int = 31): DataFrame = {
    val u = col(userCol)
    val firstDay = events.groupBy(u.as("__user"))
      .agg(min(col(tsCol).cast("date")).as("cohort_day"))
    val active = events.select(u.as("__user"),
      col(tsCol).cast("date").as("__day")).distinct()
    active.join(firstDay, Seq("__user"))
      .withColumn("day_offset", datediff(col("__day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
