package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) table layout for shuffle-free co-located
  * joins — the at-scale answer to "this fact⋈fact join shuffles 100 TB
  * every run": pay the shuffle once at write time, then every join on the
  * bucket key plans with zero Exchange on the bucketed side(s).
  *
  * Both sides bucketed on the join key with the same bucket count →
  * SortMergeJoin with no shuffle at all (asserted in BucketingSpec).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a previous JVM's in-memory catalog may have left the managed
    // location behind; Overwrite still refuses to reuse it
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val leftover = new java.io.File(warehouse, table.toLowerCase)
    if (leftover.isDirectory)
      org.apache.commons.io.FileUtils.deleteDirectory(leftover)
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True iff the physical plan contains no shuffle exchange (hash OR
    * range partitioning — a global sort's range exchange counts too). */
  def isShuffleFree(df: DataFrame): Boolean =
    !"Exchange (hash|range)partitioning".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined
}
