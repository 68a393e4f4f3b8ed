package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the newest right row with
  * right.ts <= left.ts within the same key — the standard time-series
  * enrichment operator (trades→quotes, events→dimension-snapshots), which
  * Spark has no built-in for.
  *
  * Implementation is the union+window composition (preference (a): compose
  * built-ins before custom plans):
  *   1. tag both sides, union on (key, ts);
  *   2. one window per key ordered by (ts, side) carries the last right
  *      row forward (`last(col, ignoreNulls)` over unbounded preceding);
  *   3. keep left rows, now enriched.
  *
  * Cost: ONE shuffle on the key (the window sort) — no range-join
  * explosion, no per-key driver loops; skew only where a single key is
  * hot (then pre-split by time bucket). This is the 100 TB-safe shape:
  * both inputs stream through a single sort-merge pass.
  *
  * Left rows with no preceding right row get nulls (like DuckDB
  * `ASOF LEFT JOIN`, which is also the oracle for the query suite).
  */
object AsOf {

  /** @param left       fact side (enriched)
    * @param right      reference side (carried forward)
    * @param keys       equi-join keys present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param rightCols  right columns to attach (renamed as given)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Map[String, String]): DataFrame = {
    val ts = "__asof_ts"
    val side = "__asof_side" // right=0 sorts before left=1 at equal ts
    val row = "__asof_row"
    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
    // the right row is carried as ONE struct: last(..., ignoreNulls) then
    // skips only "no right row yet" slots, never a right row that happens
    // to hold a null column — per-column carry would stitch together
    // values from DIFFERENT right rows when the newest one has nulls
    // ASOF comparison with a NULL ts never matches (DuckDB semantics, the
    // oracle): null-ts right rows are excluded up front — unfiltered they
    // would sort nulls-first and be carried into every early left row
    val r = right
      .filter(col(rightTs).isNotNull)
      .select(keys.map(col) ++
        Seq(col(rightTs).as(ts), lit(0).as(side),
          struct(rightCols.map { case (from, to) =>
            col(from).as(to) }.toSeq: _*).as(row)): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn(row, last(col(row), ignoreNulls = true).over(w))
      // ... and a null-ts LEFT row matches nothing either
      .withColumn(row, when(col(ts).isNotNull, col(row)))
    rightCols.values.foldLeft(carried) { (df, to) =>
        df.withColumn(to, col(s"$row.$to"))
      }
      .filter(col(side) === 1)
      .drop(ts, side, row)
  }
}
