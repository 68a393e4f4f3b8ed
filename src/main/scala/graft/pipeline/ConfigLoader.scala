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
  * `${ENV}` interpolation matches `goja_builder.go:60-74`.
  */
object ConfigLoader {

  private val mapper = new ObjectMapper()

  /** ${VAR} env interpolation (reference: goja_builder.go:60-74). */
  private[pipeline] def interpolate(s: String,
      env: Map[String, String] = sys.env): String =
    "\\$\\{([A-Za-z0-9_]+)\\}".r.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"undefined env var ${m.group(1)}"))))

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case other => other
  }

  def parse(json: String, env: Map[String, String] = sys.env): PipelineSpec = {
    val root = toScala(mapper.readValue(interpolate(json, env),
      classOf[java.util.Map[String, Object]])).asInstanceOf[Map[String, Any]]

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
        srcFactory(params(srcCfg)))

    val sinks = root.get("sinks") match {
      case Some(s: Seq[_]) => s.map(_.asInstanceOf[Map[String, Any]])
      case _ => throw new IllegalArgumentException("config needs sinks")
    }
    sinks.foreach { sk =>
      sk.get("transforms").foreach {
        case ts: Seq[_] => ts.map(_.asInstanceOf[Map[String, Any]]).foreach { t =>
          val fn = t.getOrElse("fn",
            throw new IllegalArgumentException("transform needs fn")).toString
          val factory = Registry.transforms.getOrElse(fn,
            throw new IllegalArgumentException(s"unknown transform: $fn"))
          builder.transform(t.getOrElse("name", fn).toString,
            factory(params(t)), t.getOrElse("ns", ".*").toString)
        }
        case _ => ()
      }
      val adaptor = sk.getOrElse("adaptor",
        throw new IllegalArgumentException("sink needs an adaptor")).toString
      val factory = Registry.sinks.getOrElse(adaptor,
        throw new IllegalArgumentException(s"unknown sink adaptor: $adaptor"))
      builder.save(sk.getOrElse("name", adaptor).toString,
        factory(params(sk)), sk.getOrElse("ns", ".*").toString)
    }
    builder.build()
  }
}
