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
      // CPU-dense shuffles must not coalesce onto 1-3 cores (see the
      // Bench session's comment — same knob, same scale story)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
