package graft.tools

import org.apache.spark.sql.SparkSession

/** One place for the local-session defaults every tool needs (UTC, nanos
  * timestamps, no UI) — the tools were each hand-rolling this block with
  * slight drift. */
object Sessions {
  def local(appName: String, defaultMaster: String = "local[8]",
      defaultPartitions: String = "8"): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", defaultMaster))
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultPartitions))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
