package graft.config

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.expr

import graft.pipeline.Pipeline
import graft.route.RouteRule
import graft.limit.LimitRule

/** Declarative YAML pipeline config — the engine's "query language", the
  * direct translation of the reference's routing YAML
  * (reference dummy.yaml:1-55, config/config.go:12-93). Predicates are SQL
  * expression strings compiled to Catalyst via `expr()`, so the whole config
  * lowers into the same optimized plan as the programmatic API.
  *
  * Example:
  * {{{
  * salt_buckets: 32
  * routes:
  *   - sink: sink_a
  *     predicate: "tool = 'bash' AND role = 'assistant'"
  * limits:
  *   - sink: sink_search
  *     throughput: 10KB        # bytes per bucket
  *     average_over: 3         # sliding mean over trailing buckets (L4)
  *     action: fallback        # fallback | discard
  *     fallback: sink_fallback
  * }}}
  */
object PipelineConfig {

  private val NamePattern = "^[a-zA-Z0-9-_]+$".r // reference config/config.go:13

  /** "10KB" / "2MB" / "512" → bytes (reference P9, bytefmt.ToBytes). */
  def parseBytes(s: String): Long = {
    val t = s.trim.toUpperCase
    val (num, mult) =
      if (t.endsWith("GB")) (t.dropRight(2), 1L << 30)
      else if (t.endsWith("MB")) (t.dropRight(2), 1L << 20)
      else if (t.endsWith("KB")) (t.dropRight(2), 1L << 10)
      else if (t.endsWith("B")) (t.dropRight(1), 1L)
      else (t, 1L)
    val v = num.trim.toDouble
    require(v >= 0, s"negative byte size: $s")
    (v * mult).toLong
  }

  final case class Parsed(config: Pipeline.Config)

  def fromYaml(yaml: String): Pipeline.Config = {
    val loaded = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](yaml)
    require(loaded != null, "empty config")
    val m = loaded.asScala

    def asList(key: String): Seq[scala.collection.mutable.Map[String, Object]] =
      m.get(key) match {
        case Some(l: java.util.List[_]) =>
          l.asScala.toSeq.map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
        case None => Seq.empty
        case other => throw new IllegalArgumentException(s"$key must be a list, got $other")
      }
    def str(e: scala.collection.mutable.Map[String, Object], k: String): String =
      e.getOrElse(k, throw new IllegalArgumentException(s"missing '$k' in $e")).toString

    val routes = asList("routes").map { e =>
      val sink = str(e, "sink")
      require(NamePattern.matches(sink), s"invalid sink name: $sink") // F5
      RouteRule(sink, expr(str(e, "predicate")))
    }
    require(routes.nonEmpty, "config needs at least one route")

    val limits = asList("limits").map { e =>
      val action = str(e, "action")
      require(Set("fallback", "discard", "alert")(action),
        s"action must be fallback|discard|alert: $action") // F5
      val fallback = e.get("fallback").map(_.toString)
      require(action != "fallback" || fallback.nonEmpty, "fallback action needs 'fallback' sink")
      LimitRule(
        sink = str(e, "sink"),
        bytesPerBucket = parseBytes(str(e, "throughput")),
        avgOverBuckets = e.get("average_over").map(_.toString.toInt).getOrElse(1),
        action = action,
        fallbackSink = fallback)
    }

    val salt = m.get("salt_buckets").map(_.toString.toInt).getOrElse(32)
    Pipeline.Config(routeRules = routes, limitRules = limits, saltBuckets = salt)
  }

  def fromFile(path: String): Pipeline.Config =
    fromYaml(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
