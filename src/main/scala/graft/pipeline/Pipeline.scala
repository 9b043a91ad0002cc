package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Transcripts
import graft.parse.GrokParser
import graft.enrich.Enrichment
import graft.route.{RouteRule, Router}
import graft.limit.{LimitRule, RateLimit}
import graft.manifest.Manifest

/** End-to-end job: scan → parse → enrich → route → fan-out → rate-limit →
  * per-sink writes + manifest commit + metrics.
  *
  * This is the Spark translation of the reference's `log-shipper run`
  * lifecycle (reference cmd/run.go:49-97, SURVEY.md §3.1): the YAML routing
  * config becomes [[RouteRule]]s compiled to Catalyst expressions; the
  * broker/worker goroutine graph becomes ONE declarative Dataset chain that
  * Catalyst plans; the Consul-KV dedup set becomes the write-then-commit
  * manifest.
  *
  * Scale design:
  *  - single scan of the fact table feeds every sink (array+explode router,
  *    not per-sink scans);
  *  - the only shuffles are the per-sink/per-conv aggregates and the
  *    rate-limit verdict aggregation (all map-side-combined, output rows ≪
  *    input rows); verdict joins back are broadcasts;
  *  - the routed stream is salted-repartitioned before the per-sink writes so
  *    one hot conversation cannot pin a single output task (reference analog:
  *    one slow target blocking its channel, broker/connector.go:315-318 —
  *    unhandled there, handled here per north_rule);
  *  - AQE enabled in session conf handles residual skew at runtime.
  */
object Pipeline {

  final case class Config(
      routeRules: Seq[RouteRule] = Router.defaultRules,
      limitRules: Seq[LimitRule] = RateLimit.defaultRules(),
      saltBuckets: Int = 32
  )

  /** Parse, then salted-repartition on (conv_id, hash(turn_idx) % salt).
    *
    * The repartition serves three purposes at once:
    *  1. skew: a hot conversation spreads over `saltBuckets` tasks
    *     (north_rule "salted repartitioning"), AQE handles the rest;
    *  2. expression barrier: downstream operators reference the parsed
    *     fields as exchange-output ATTRIBUTES — without it, Catalyst's alias
    *     inlining re-evaluates the grok regex at every reference (measured
    *     44 copies in the optimized plan, and the route stage ran slower on
    *     more cores);
    *  3. reuse: the rate-limit verdict aggregates and the main routed stream
    *     consume the SAME exchange (ReusedExchange), so the scan+parse runs
    *     exactly once per job.
    */
  def parsedSalted(turns: DataFrame, saltBuckets: Int = 32): DataFrame =
    GrokParser.parse(turns)
      // project BEFORE the exchange: the pipeline needs only `level` from the
      // parse (routing predicate + quarantine flag); carrying dur_ms/status/
      // payload (payload ≈ a copy of text) would nearly double the shuffled
      // bytes of the job's one big exchange
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), col("ts"), col("level"))
      .repartition(col("conv_id"), pmod(hash(col("turn_idx")), lit(saltBuckets)))

  /** parse → salt-repartition → enrich → route → limit;
    * returns (routedFinal, dropped). */
  def route(turns: DataFrame, spark: SparkSession, cfg: Config = Config()): (DataFrame, DataFrame) = {
    val parsed = parsedSalted(turns, cfg.saltBuckets)
    val enriched = Enrichment.enrich(parsed, spark)
    val fanned = Router.fanOut(enriched, cfg.routeRules)
    // Verdict statistics reuse the SAME salted plan as the write path.
    // (Measured alternative: an unsalted stats plan avoids the exchange
    // round trip but loses the exchange's expression barrier, so the grok
    // work re-inflates — 3x slower end to end. The exchange pays for itself.)
    RateLimit.apply(fanned, cfg.limitRules)
  }

  /** Full run with per-sink writes, manifest commits and resume.
    * Returns the per-sink aggregate DataFrame (also persisted as metrics). */
  def run(
      spark: SparkSession,
      sfDir: String,
      outRoot: String,
      runId: String,
      cfg: Config = Config(),
      failAfterSinks: Int = Int.MaxValue // test hook: simulate a mid-job kill
  ): DataFrame = {
    val turns = Transcripts.fromEvents(spark, sfDir)
    val (routedFinal, _) = route(turns, spark, cfg)

    val manifest = new Manifest(outRoot)
    val already = manifest.committedSinks()
    val sinks = routedFinal.select("sink").distinct().collect().map(_.getString(0)).sorted
    val toDo = sinks.filterNot(already.contains)

    // Cache the routed set once; every per-sink write filters the cached plan.
    // (The salted repartition already happened post-parse, so write tasks are
    // evenly distributed even under hot-conversation skew.)
    // observe() = runtime-visible counters with zero extra passes — the
    // reference's live Stats (monitoring/stats.go:10-118) as Spark metrics.
    val obs = new org.apache.spark.sql.Observation(s"graft_metrics_$runId")
    val cached = routedFinal
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
      .observe(obs,
        count(lit(1)).as("routed_rows"),
        sum(octet_length(col("text"))).as("routed_bytes"),
        approx_count_distinct(col("sink")).as("sinks")) // observe() forbids exact distinct aggs
      .cache()
    var written = 0
    try {
      toDo.foreach { sink =>
        if (written < failAfterSinks) {
          manifest.writeAndCommit(sink, cached.filter(col("sink") === sink), runId)
          written += 1
        }
      }
    } finally cached.unpersist()

    // Persist the observed run metrics next to the lineage entries (A1/A2).
    // obs.get blocks until an action over the observed plan completed, so
    // only read it if at least one sink write ran this invocation.
    if (written > 0) {
      val m = obs.get
      val metricsJson = s"""{"run_id":"$runId","routed_rows":${m("routed_rows")},""" +
        s""""routed_bytes":${m("routed_bytes")},"sinks":${m("sinks")}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outRoot, "_manifest", s"_metrics_$runId.json"), metricsJson)
    }

    // Final per-sink aggregate FROM THE MANIFEST ENTRIES — writeAndCommit
    // already computed rows/bytes/convs per sink on the cached routed set, so
    // re-reading every committed sink's parquet here (the round-1 shape) would
    // be a complete second read of all written data at the 100 TB design
    // point. The manifest IS the aggregate. (_metrics_* sidecar files carry
    // no sink field — the isNotNull filter excludes them.)
    manifest.entries(spark)
      .filter(col("sink").isNotNull)
      .select(col("sink"), col("row_count").cast("long").as("turns"),
        col("bytes").cast("long").as("bytes"), col("convs").cast("long").as("convs"))
  }
}
