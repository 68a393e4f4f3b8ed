package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.ConfigLoader

/** `transporter run` / `transporter test` analogue
  * (`cmd/transporter/run.go:3-22`, `cmd/transporter/test.go:7-27`):
  *
  *   runMain graft.tools.RunPipeline <config.json>          # run it
  *   runMain graft.tools.RunPipeline --test <config.json>   # print the tree
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val (testOnly, cfgPath) = args.toList match {
      case "--test" :: p :: Nil => (true, p)
      case p :: "--test" :: Nil => (true, p)
      case p :: Nil if p != "--test" => (false, p)
      case _ =>
        System.err.println(
          "usage: graft.tools.RunPipeline [--test] <config.json>")
        sys.exit(2)
    }
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(cfgPath))
    val spec = ConfigLoader.parse(json)
    if (testOnly) {
      print(spec.describe)
      return
    }
    val spark = Sessions.local(s"graft-${spec.name}")
    try {
      print(spec.describe)
      spec.run(spark)
      println(s"[run] pipeline '${spec.name}' completed")
    } finally spark.stop()
  }
}
