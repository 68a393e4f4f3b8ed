package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.FileCompaction

class FileCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("compact").toFile
    d.delete()
    d.getAbsolutePath
  }

  test("many small files compact to ~targetBytes files, data intact") {
    val dir = freshDir()
    val df = (1 to 20000).map(i => (i.toLong, s"row $i", i % 7))
      .toDF("id", "text", "k")
    df.repartition(40).write.parquet(dir)
    val preFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(preFiles == 40)

    val stats = FileCompaction.compact(spark, dir, targetBytes = 64L << 10)
    assert(stats.filesBefore == 40)
    assert(stats.filesAfter < 40 && stats.filesAfter >= 1)
    assert(stats.rows == 20000)

    val after = spark.read.parquet(dir)
    assert(after.count() == 20000)
    assert(after.except(df).isEmpty && df.except(after).isEmpty)
    // tmp/bak gone
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    assert(!new java.io.File(dir + ".compact-bak").exists())
  }

  test("already-compact directory is a no-op") {
    val dir = freshDir()
    (1 to 100).toDF("id").coalesce(1).write.parquet(dir)
    val mtimes = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    val stats = FileCompaction.compact(spark, dir, targetBytes = 128L << 20)
    assert(stats.filesBefore == 1 && stats.filesAfter == 1 && stats.rows == 100)
    val after = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == mtimes) // untouched, not rewritten
  }

  test("output file sizes are near-uniform (round-robin, not coalesce)") {
    val dir = freshDir()
    // skewed inputs: one big file + many tiny ones
    (1 to 15000).map(i => (i.toLong, "x" * 100)).toDF("id", "pad")
      .coalesce(1).write.parquet(dir)
    (15001 to 15040).map(i => (i.toLong, "x" * 100)).toDF("id", "pad")
      .repartition(40).write.mode("append").parquet(dir)
    FileCompaction.compact(spark, dir, targetBytes = 256L << 10)
    val sizes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length)
    assert(spark.read.parquet(dir).count() == 15040)
    if (sizes.length > 1)
      assert(sizes.max.toDouble / sizes.min < 3.0,
        s"skewed outputs: ${sizes.mkString(",")}")
  }
}
