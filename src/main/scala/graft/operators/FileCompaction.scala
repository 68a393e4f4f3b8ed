package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest needs: streaming epochs and fine-grained upserts accrete many
  * small parquet files, and at 100 TB the resulting task-per-tiny-file
  * scheduling + open/footer overhead dominates scan time. Compaction
  * rewrites a directory to ~targetBytes files.
  *
  * Round-robin `repartition(n)` (one shuffle) rather than `coalesce(n)`:
  * coalesce is shuffle-free but merges ADJACENT input files, so a skewed
  * mix of 1 KB and 1 GB files yields skewed outputs; round-robin gives
  * uniform file sizes, which is what downstream scan parallelism wants.
  * The shuffle cost is paid once and only over the compacted partitions.
  *
  * Swap protocol: write to `<dir>.compact-tmp`, verify row count, then
  * rename dir → `.compact-bak`, tmp → dir, drop bak. On HDFS these
  * renames are atomic per step; on an object store a table format's
  * manifest commit should replace the swap (the same pointer-flip our
  * streaming upsert sink implements with its CURRENT file —
  * `streaming/StreamPipeline.scala`).
  */
object FileCompaction {

  final case class Stats(filesBefore: Int, bytesBefore: Long,
      filesAfter: Int, rows: Long)

  /** Compact `dir` (a parquet directory) to ~targetBytes files.
    * No-op (returns stats unchanged) if the directory already has ≤ the
    * target file count. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Stats = {
    require(targetBytes > 0, "targetBytes must be > 0")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles() = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    if (before.length <= nOut)
      return Stats(before.length, bytes, before.length,
        spark.read.parquet(dir).count())

    val tmp = new Path(dir + ".compact-tmp")
    val bak = new Path(dir + ".compact-bak")
    fs.delete(tmp, true); fs.delete(bak, true)

    val df = spark.read.parquet(dir)
    df.repartition(nOut).write.parquet(tmp.toString)

    // verify before swapping: a lost-task torn write must never replace
    // good data
    val inRows = df.count()
    val outRows = spark.read.parquet(tmp.toString).count()
    if (inRows != outRows) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction row mismatch for $dir: $inRows in vs $outRows out")
    }

    if (!fs.rename(path, bak))
      throw new IllegalStateException(s"compaction: cannot move $dir aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // roll back
      throw new IllegalStateException(s"compaction: cannot publish $tmp")
    }
    fs.delete(bak, true)
    val after = dataFiles()
    Stats(before.length, bytes, after.length, outRows)
  }
}
