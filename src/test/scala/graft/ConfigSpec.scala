package graft

import graft.config.PipelineConfig
import graft.model.Transcripts
import graft.parse.GrokParser
import graft.route.Router
import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._

/** YAML config → Catalyst compilation parity with the programmatic rules
  * (reference config round-trip tests, config/config_test.go:15-200). */
class ConfigSpec extends SparkSpec {

  private val yaml =
    """salt_buckets: 16
      |routes:
      |  - sink: sink_a
      |    predicate: "tool = 'bash' AND role = 'assistant'"
      |  - sink: sink_b
      |    predicate: "role = 'tool'"
      |  - sink: sink_err
      |    predicate: "level IN ('ERROR', 'WARN')"
      |  - sink: sink_search
      |    predicate: "tool = 'search'"
      |limits:
      |  - sink: sink_search
      |    throughput: 10KB
      |    average_over: 3
      |    action: fallback
      |    fallback: sink_fallback
      |  - sink: sink_fallback
      |    throughput: 5KB
      |    average_over: 3
      |    action: discard
      |""".stripMargin

  test("byte-size parsing (reference P9 semantics)") {
    assert(PipelineConfig.parseBytes("10KB") === 10240L)
    assert(PipelineConfig.parseBytes("2MB") === 2097152L)
    assert(PipelineConfig.parseBytes("512") === 512L)
    assert(PipelineConfig.parseBytes("1.5KB") === 1536L)
  }

  test("invalid configs are rejected (reference F5 validators)") {
    intercept[IllegalArgumentException](PipelineConfig.fromYaml("routes: []"))
    intercept[IllegalArgumentException](PipelineConfig.fromYaml(
      "routes:\n  - sink: \"bad name!\"\n    predicate: \"role = 'x'\""))
    intercept[IllegalArgumentException](PipelineConfig.fromYaml(
      """routes:
        |  - sink: a
        |    predicate: "role = 'x'"
        |limits:
        |  - sink: a
        |    throughput: 1KB
        |    action: explode
        |""".stripMargin))
    intercept[IllegalArgumentException](PipelineConfig.fromYaml(
      """routes:
        |  - sink: a
        |    predicate: "role = 'x'"
        |limits:
        |  - sink: a
        |    throughput: 1KB
        |    action: fallback
        |""".stripMargin))
  }

  test("YAML-configured routing matches the programmatic default rules") {
    val cfg = PipelineConfig.fromYaml(yaml)
    assert(cfg.saltBuckets === 16)
    val turns = Transcripts.synthetic(spark, 30, 8)
    val parsed = GrokParser.parse(turns)
    val fromYamlCounts = Router.fanOut(parsed, cfg.routeRules)
      .groupBy("sink").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val programmatic = Router.fanOut(parsed, Router.defaultRules)
      .groupBy("sink").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromYamlCounts === programmatic)
  }

  test("YAML config drives the full pipeline") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val turns = Transcripts.synthetic(spark, 20, 6)
    val (routed, dropped) = Pipeline.route(turns, spark, cfg)
    assert(routed.count() > 0)
    assert(dropped.count() >= 0)
    assert(routed.filter(col("sink") === "nonexistent").count() === 0)
  }
}
