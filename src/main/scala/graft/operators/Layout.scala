package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning — the write-side half of
  * "fast at 100 TB": parquet readers skip row groups whose min/max
  * stats exclude the predicate, but stats are only selective if the
  * writer CLUSTERED the data. A plain sort clusters one column; z-order
  * (Morton curve) interleaving keeps min/max tight on EVERY clustered
  * column, so `WHERE user_id = ? AND ts BETWEEN ?` prunes on both.
  *
  * The z-value is pure Column algebra (bit ops, codegen'd): each column
  * is min/max-normalized onto a 16-bit grid, and the grid bits are
  * interleaved round-robin. Range-partitioning by z-value then gives
  * each output file a compact hyper-rectangle of the key space.
  *
  * Cost shape: one min/max agg pass + one range shuffle with in-task
  * sort — the same two passes `repartitionByRange` alone needs (its
  * sampling pass is the analogue of the stats pass).
  */
object Layout {

  /** Morton-interleaved z-value of `cols`, each normalized to 16 bits
    * using the given [min, max] bounds. Null or constant columns map to
    * grid 0 (they contribute no selectivity, but never error). */
  def zorderValue(cols: Seq[Column], mins: Seq[Double],
      maxs: Seq[Double]): Column = {
    require(cols.nonEmpty && cols.size == mins.size && cols.size == maxs.size,
      "cols/mins/maxs must align and be non-empty")
    require(cols.size <= 3, "z-order beyond 3 dims dilutes per-column " +
      "selectivity; cluster on the query-predicate columns only")
    val d = cols.size
    val grids = cols.lazyZip(mins).lazyZip(maxs).map { (c, mn, mx) =>
      if (mx <= mn) lit(0L)
      else least(lit(65535L), greatest(lit(0L),
        floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(65535.0))
          .cast("bigint")))
    }
    val terms = for {
      b <- 0 until 16
      (g, i) <- grids.zipWithIndex
    } yield shiftleft(shiftright(g, b).bitwiseAND(lit(1L)), b * d + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` to `dir` as `numFiles` z-ordered parquet files clustered
    * on `cols` (numeric/timestamp). Bounds come from a single min/max
    * aggregation over the input. */
  def zorderWrite(df: DataFrame, cols: Seq[String], dir: String,
      numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be > 0")
    val bounds = df.agg(
      cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"))).head,
      cols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c"))).tail: _*).head()
    val mins = cols.indices.map(i => Option(bounds.get(2 * i))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    val maxs = cols.indices.map(i => Option(bounds.get(2 * i + 1))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    df.withColumn("__z", zorderValue(cols.map(col), mins, maxs))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
