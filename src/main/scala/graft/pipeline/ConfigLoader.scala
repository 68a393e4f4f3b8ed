package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** JSON pipeline configs → PipelineSpec, the declarative analogue of the
  * reference's JS builder DSL (`cmd/transporter/goja_builder.go` — the JS
  * engine itself is out of scope per SURVEY §7.3; this covers the same
  * declarations minus arbitrary JS):
  *
  * {
  *   "name": "copy",
  *   "source": {"adaptor": "tables", "name": "src",
  *              "dir": "/root/testdata/sf0.001", "tables": ["region"]},
  *   "sinks": [
  *     {"adaptor": "file", "name": "out", "uri": "/tmp/out", "ns": ".*",
  *      "transforms": [
  *        {"fn": "rename", "name": "r", "field_map": {"r_name": "name"}},
  *        {"fn": "skip", "field": "tkey", "operator": ">", "match": 1}
  *      ]}
  *   ]
  * }
  *
  * `${ENV}` interpolation follows `goja_builder.go:60-74` with one
  * deliberate hardening: the reference substitutes "" for unset vars
  * (os.Getenv); here an unset var is an error — a silently-empty path or
  * table list produces confusing downstream failures. Interpolation is
  * applied per STRING VALUE after JSON parsing, so env values containing
  * quotes/backslashes can neither break parsing nor inject config keys.
  */
object ConfigLoader {

  private val mapper = new ObjectMapper()

  /** ${VAR} env interpolation on one string value. */
  private[pipeline] def interpolate(s: String,
      env: Map[String, String] = sys.env): String =
    "\\$\\{([A-Za-z0-9_]+)\\}".r.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"undefined env var ${m.group(1)}"))))

  private def toScala(v: Any, env: Map[String, String]): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x, env) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala(_, env)).toSeq
    case s: String => interpolate(s, env)
    case other => other
  }

  def parse(json: String, env: Map[String, String] = sys.env): PipelineSpec = {
    val root = toScala(mapper.readValue(json,
      classOf[java.util.Map[String, Object]]), env)
      .asInstanceOf[Map[String, Any]]

    def params(m: Map[String, Any]): Registry.Params = m

    val name = root.getOrElse("name", "pipeline").toString
    val srcCfg = root.get("source") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException("config needs a source")
    }
    val srcAdaptor = srcCfg.getOrElse("adaptor",
      throw new IllegalArgumentException("source needs an adaptor")).toString
    val srcFactory = Registry.sources.getOrElse(srcAdaptor,
      throw new IllegalArgumentException(s"unknown source adaptor: $srcAdaptor"))
    val builder = Pipeline.builder(name)
      .source(srcCfg.getOrElse("name", srcAdaptor).toString,
        withContext(s"source '$srcAdaptor'")(srcFactory(params(srcCfg))))
    // `mode: stream` + `checkpoint`: drive the source's tail as a
    // streaming query (PipelineSpec.runStream) instead of a one-shot read
    root.get("mode").map(_.toString) match {
      case Some("stream") =>
        builder.streaming(root.getOrElse("checkpoint",
          throw new IllegalArgumentException(
            "mode: stream needs a checkpoint")).toString)
      case Some(other) if other != "batch" =>
        throw new IllegalArgumentException(s"unknown pipeline mode: $other")
      case _ => ()
    }

    val sinks = root.get("sinks") match {
      case Some(s: Seq[_]) => s.map(_.asInstanceOf[Map[String, Any]])
      case _ => throw new IllegalArgumentException("config needs sinks")
    }
    sinks.foreach { sk =>
      val sinkName = sk.getOrElse("name",
        sk.getOrElse("adaptor", "?")).toString
      sk.get("transforms").foreach {
        case ts: Seq[_] => ts.map(_.asInstanceOf[Map[String, Any]]).foreach { t =>
          val fn = t.getOrElse("fn",
            throw new IllegalArgumentException(
              s"sink '$sinkName': transform needs fn")).toString
          val factory = Registry.transforms.getOrElse(fn,
            throw new IllegalArgumentException(
              s"sink '$sinkName': unknown transform: $fn"))
          builder.transform(t.getOrElse("name", fn).toString,
            withContext(s"sink '$sinkName' transform '$fn'")(
              factory(params(t))),
            t.getOrElse("ns", ".*").toString)
        }
        case other => throw new IllegalArgumentException(
          s"sink '$sinkName': transforms must be a JSON array, got: $other")
      }
      val adaptor = sk.getOrElse("adaptor",
        throw new IllegalArgumentException(
          s"sink '$sinkName' needs an adaptor")).toString
      val factory = Registry.sinks.getOrElse(adaptor,
        throw new IllegalArgumentException(s"unknown sink adaptor: $adaptor"))
      builder.save(sk.getOrElse("name", adaptor).toString,
        withContext(s"sink '$adaptor'")(factory(params(sk))),
        sk.getOrElse("ns", ".*").toString)
    }
    builder.build()
  }

  /** Rethrow factory/param errors with the offending element named. */
  private def withContext[A](ctx: String)(body: => A): A =
    try body catch {
      case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"$ctx: ${e.getMessage}")
    }
}
