package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.functions.Transforms
import graft.sources.Connectors.{Sink, Source}

/** The reference's pipeline builder DSL (`cmd/transporter/goja_builder.go`:
  * `t.Source(...).Transform(...).Save(...)`) as a Scala spec compiled to
  * DataFrame lineage.
  *
  * Structure mirrors the Node tree (`pipeline/node.go:55-85`): ONE source
  * fanning out to N sinks, each sink owning an ordered transform chain and
  * a namespace filter applied before its transforms
  * (`pipeline/node.go:522-531,596-619`).
  *
  * Execution model difference, by design: the reference pumps one message
  * at a time through goroutines+channels; here the "logical plan" IS a
  * Catalyst plan and each sink is an independent action over a shared,
  * cached source. Fan-out therefore costs one source scan (cached) + N
  * sink-side plans, all vectorized.
  */
final case class TransformStep(name: String, nsFilter: String,
    fn: DataFrame => DataFrame)

final case class SinkNode(name: String, nsFilter: String,
    transforms: Seq[TransformStep], sink: Sink)

final case class PipelineSpec(name: String, source: Source,
    sourceName: String, sinks: Seq[SinkNode]) {

  /** `transporter test`-style tree rendering (`pipeline/node.go:233-252`). */
  def describe: String = {
    val sb = new StringBuilder(s"$name:\n - Source: $sourceName\n")
    sinks.foreach { s =>
      sb.append(s"   - Sink: ${s.name} (ns=/${s.nsFilter}/)\n")
      s.transforms.foreach(t =>
        sb.append(s"     - Transform: ${t.name} (ns=/${t.nsFilter}/)\n"))
    }
    sb.result()
  }

  /** Compile each sink's full lineage (for explain/inspection). */
  def compile(spark: SparkSession): Map[String, DataFrame] = {
    val src = source.read(spark)
    sinks.map(s => s.name -> compileSink(src, s)).toMap
  }

  private def compileSink(src: DataFrame, s: SinkNode): DataFrame = {
    import org.apache.spark.sql.functions.{col, not}
    val filtered =
      if (s.nsFilter == ".*") src else Transforms.nsFilter(s.nsFilter)(src)
    s.transforms.foldLeft(filtered) { (df, t) =>
      // Reference semantics (pipeline/node.go:596-619): a transform whose
      // ns filter doesn't match a message SKIPS the transform — the
      // message still reaches the sink unmodified; and command messages
      // bypass transforms entirely (node.go:597). Only the SINK-level ns
      // filter drops rows.
      val exemptions = Seq(
        if (t.nsFilter != ".*" && df.columns.contains(graft.core.Envelope.NsCol))
          Some(not(col(graft.core.Envelope.NsCol)
            .rlike(t.nsFilter.stripPrefix("/").stripSuffix("/"))))
        else None,
        if (df.columns.contains(graft.core.Envelope.OpCol))
          Some(col(graft.core.Envelope.OpCol) ===
            graft.core.Envelope.Op.Command)
        else None
      ).flatten
      if (exemptions.isEmpty) t.fn(df)
      else {
        val bypassCond = exemptions.reduce(_ || _)
        val bypassed = df.filter(bypassCond)
        val transformed = t.fn(df.filter(not(bypassCond)))
        // transforms may reshape the doc; the union keeps both shapes,
        // null-filling columns the other branch lacks (schemaless parity)
        transformed.unionByName(bypassed, allowMissingColumns = true)
      }
    }
  }

  /** Run all sinks off one cached source scan. */
  def run(spark: SparkSession): Unit = {
    val src = source.read(spark)
    val shared = if (sinks.length > 1)
      src.persist(StorageLevel.MEMORY_AND_DISK) else src
    try {
      sinks.foreach(s => s.sink.write(compileSink(shared, s)))
    } finally {
      if (sinks.length > 1) shared.unpersist()
    }
  }
}

/** Fluent builder mirroring the JS DSL shape. */
final class PipelineBuilder(name: String) {
  private var src: Option[(String, Source)] = None
  private var pendingTransforms: Vector[TransformStep] = Vector.empty
  private var sinkNodes: Vector[SinkNode] = Vector.empty

  def source(srcName: String, s: Source): PipelineBuilder = {
    require(src.isEmpty, "source already set")
    src = Some((srcName, s)); this
  }

  /** Transforms accumulate and attach to the NEXT save() — exactly the
    * builder semantics of `goja_builder.go:217-242,244-293`. */
  def transform(tName: String, fn: DataFrame => DataFrame,
      ns: String = ".*"): PipelineBuilder = {
    pendingTransforms :+= TransformStep(tName, ns, fn); this
  }

  def save(sName: String, sink: Sink, ns: String = ".*"): PipelineBuilder = {
    sinkNodes :+= SinkNode(sName, ns, pendingTransforms, sink)
    pendingTransforms = Vector.empty
    this
  }

  def build(): PipelineSpec = {
    val (sn, s) = src.getOrElse(throw new IllegalStateException("no source"))
    require(sinkNodes.nonEmpty, "pipeline has no sinks") // node.go:654-669
    PipelineSpec(name, s, sn, sinkNodes)
  }
}

object Pipeline {
  def builder(name: String): PipelineBuilder = new PipelineBuilder(name)
}
