package graft.events

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** The reference's events system (`events/events.go:29-113`): a pipeline
  * periodically emits JSON events — `boot` {version, endpoints} at start,
  * `metrics` {path, records} per node (fed by `pipe.MessageCount`,
  * `pipe/pipe.go:50,115,161`, broadcast by
  * `pipeline/pipeline.go:158-162`), `error` {path, message} on failure,
  * `exit` at shutdown.
  *
  * Spark-first mapping — counts come from the ENGINE, not a side loop:
  *
  *   - per-sink record counts ride the query itself as a `CollectMetrics`
  *     node (`df.observe(count(*))`): zero extra passes, aggregated on
  *     executors alongside the real work — the columnar analogue of the
  *     pipe incrementing MessageCount per message;
  *   - batch queries surface them through a `QueryExecutionListener`
  *     (onSuccess/onFailure = write-confirm/error), streaming queries
  *     through a `StreamingQueryListener` (started/progress/terminated =
  *     boot/metrics/exit), each progress carrying a CUMULATIVE record
  *     count per query to match MessageCount's monotone semantics;
  *   - emitters are pluggable like the reference's log/HTTP emitters
  *     (`events/emitter.go`): an in-memory buffer (tests/ops introspection)
  *     and a JSON-lines file appender (no egress in this environment).
  */
object Events {

  /** One pipeline event, JSON-shaped like `events/events.go` (`name` is
    * the kind — boot/metrics/error/exit). */
  final case class GraftEvent(ts: Long, name: String, path: String = "",
      records: Long = -1L, message: String = "", version: String = "",
      endpoints: Map[String, String] = Map.empty) {
    private def esc(s: String) =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case '\n' => "\\n"; case c => c.toString }
    def toJson: String = {
      val b = Seq.newBuilder[String]
      b += s""""ts":$ts"""
      b += s""""name":"${esc(name)}""""
      if (path.nonEmpty) b += s""""path":"${esc(path)}""""
      if (records >= 0) b += s""""records":$records"""
      if (message.nonEmpty) b += s""""message":"${esc(message)}""""
      if (version.nonEmpty) b += s""""version":"${esc(version)}""""
      if (endpoints.nonEmpty)
        b += s""""endpoints":{${endpoints.toSeq.sorted
          .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
          .mkString(",")}}"""
      b.result().mkString("{", ",", "}")
    }
  }

  trait Emitter {
    def emit(e: GraftEvent): Unit
  }

  /** Thread-safe buffering emitter (listeners fire on listener-bus
    * threads). */
  final class BufferingEmitter extends Emitter {
    private val q = new ConcurrentLinkedQueue[GraftEvent]()
    def emit(e: GraftEvent): Unit = q.add(e)
    def events: Seq[GraftEvent] = {
      import scala.jdk.CollectionConverters._
      q.iterator().asScala.toSeq
    }
    def ofKind(kind: String): Seq[GraftEvent] = events.filter(_.name == kind)
  }

  /** JSON-lines appender — the offline stand-in for the reference's HTTP
    * emitter. */
  final class JsonFileEmitter(path: String) extends Emitter {
    def emit(e: GraftEvent): Unit = synchronized {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        e.toJson + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  /** Fan-out to several emitters (log + file, like the reference's
    * multi-emitter). */
  final class TeeEmitter(targets: Emitter*) extends Emitter {
    def emit(e: GraftEvent): Unit = targets.foreach(_.emit(e))
  }

  private def now(): Long = System.currentTimeMillis()

  val MetricPrefix = "graft.metrics:"

  /** Attach a record counter to a sink's frame: a CollectMetrics node
    * named after the node path, aggregated on executors with the query
    * itself (`pipe.MessageCount`, vectorized). */
  def instrument(df: DataFrame, path: String): DataFrame =
    df.observe(MetricPrefix + path, count(lit(1)).as("records"))

  /** Batch observability: turns every completed action that carries
    * instrumented frames into `metrics` events, failures into `error`
    * events. Register via `spark.listenerManager.register`. */
  final class BatchListener(emitter: Emitter) extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        if (name.startsWith(MetricPrefix))
          emitter.emit(GraftEvent(now(), "metrics",
            path = name.stripPrefix(MetricPrefix),
            records = row.getAs[Long]("records")))
      }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit =
      emitter.emit(GraftEvent(now(), "error", path = funcName,
        message = String.valueOf(exception.getMessage)))
  }

  /** Streaming observability: query lifecycle → boot/metrics/exit|error
    * events; `records` is CUMULATIVE input rows per query (MessageCount's
    * monotone counter), reset only when the query restarts. */
  final class StreamListener(emitter: Emitter) extends StreamingQueryListener {
    private val totals =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()

    override def onQueryStarted(
        event: StreamingQueryListener.QueryStartedEvent): Unit =
      emitter.emit(GraftEvent(now(), "boot",
        path = Option(event.name).getOrElse(event.id.toString),
        endpoints = Map("query" -> event.id.toString)))

    override def onQueryProgress(
        event: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = event.progress
      val total = totals.merge(p.id, p.numInputRows, (a, b) => a + b)
      emitter.emit(GraftEvent(p.timestamp match {
        case null => now()
        case t => java.time.Instant.parse(t).toEpochMilli
      }, "metrics",
        path = Option(p.name).getOrElse(p.id.toString), records = total))
    }

    override def onQueryTerminated(
        event: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      totals.remove(event.id)
      event.exception match {
        case Some(msg) => emitter.emit(GraftEvent(now(), "error",
          path = event.id.toString, message = msg))
        case None => emitter.emit(GraftEvent(now(), "exit",
          path = event.id.toString))
      }
    }
  }

  /** Register both listeners on a session; returns an unregister thunk
    * (listeners are session-global — scope them to the pipeline run). */
  def attach(spark: SparkSession, emitter: Emitter): () => Unit = {
    val b = new BatchListener(emitter)
    val s = new StreamListener(emitter)
    spark.listenerManager.register(b)
    spark.streams.addListener(s)
    () => {
      spark.listenerManager.unregister(b)
      spark.streams.removeListener(s)
    }
  }

  def boot(emitter: Emitter, version: String,
      endpoints: Map[String, String]): Unit =
    emitter.emit(GraftEvent(now(), "boot", version = version,
      endpoints = endpoints))

  def exit(emitter: Emitter, version: String,
      endpoints: Map[String, String]): Unit =
    emitter.emit(GraftEvent(now(), "exit", version = version,
      endpoints = endpoints))

  def error(emitter: Emitter, path: String, message: String): Unit =
    emitter.emit(GraftEvent(now(), "error", path = path, message = message))
}
