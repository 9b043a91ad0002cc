package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Transcripts
import graft.parse.GrokParser
import graft.enrich.Enrichment
import graft.route.{RouteRule, Router}
import graft.limit.{LimitRule, RateLimit, SinglePassLimit}
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

  /** parse → project, WITHOUT the barrier exchange — for plans whose one
    * shuffle is the single-pass limiter's (sink, bucket, salt) exchange.
    * Safe only because route references to `level` collapse into ONE Project,
    * where whole-stage codegen's subexpression elimination evaluates the grok
    * regex once per row (PlanShapeSpec asserts this on the single-pass plan). */
  def parsedProjected(turns: DataFrame): DataFrame =
    GrokParser.parse(turns)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("tool"), col("ts"), col("level"))

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

  /** Full run with single-pass limiting, per-sink promotion, manifest commits
    * and resume. Returns the per-sink aggregate DataFrame (also persisted as
    * metrics).
    *
    * Single-pass shape (DESIGN.md "data movement" list, round-2 revision):
    * the routed rows are written ONCE to a staging table partitioned by
    * (sink, bucket); limiter verdicts come from a column-pruned scan of the
    * staged files; fallback/discard are partition-directory moves; committing
    * a sink = one atomic directory rename + manifest entry. The round-1 shape
    * (verdict pre-pass + full-table cache + per-sink filtered writes) touched
    * the fact table 2+ times and pinned it in executor memory.
    *
    * Resume note: a resumed run re-stages ALL sinks — limiter verdicts must
    * see the full (sink, bucket) volumes, including buckets whose sink is
    * already committed, or fallback accounting would change across a resume.
    * Only uncommitted sinks are promoted.
    */
  def run(
      spark: SparkSession,
      sfDir: String,
      outRoot: String,
      runId: String,
      cfg: Config = Config(),
      failAfterSinks: Int = Int.MaxValue // test hook: simulate a mid-job kill
  ): DataFrame = {
    val turns = Transcripts.fromEvents(spark, sfDir)

    // Per-STAGE observe() counters (reference /api/sources + /api/workers
    // parity, web/api/sources.go:30-89, workers.go:27-84): each stage of the
    // one staging pass reports its own rows — runtime-visible metrics with
    // zero extra passes. Conservation invariants (asserted in ManifestSpec):
    // scan_rows = parse_ok + parse_quarantined; route_in = scan_rows;
    // fanout_rows ≥ route_in (fan-out duplicates); dead-letter routed rows =
    // quarantined + unmatched.
    val obsScan = new org.apache.spark.sql.Observation(s"graft_scan_$runId")
    val obsParse = new org.apache.spark.sql.Observation(s"graft_parse_$runId")
    val obsRoute = new org.apache.spark.sql.Observation(s"graft_route_$runId")
    val scanned = turns.observe(obsScan, count(lit(1)).as("rows"))
    val parsed = parsedSalted(scanned, cfg.saltBuckets)
      .observe(obsParse,
        sum(when(col("level").isNotNull, 1L).otherwise(0L)).as("rows_ok"),
        sum(when(col("level").isNull, 1L).otherwise(0L)).as("rows_quarantined"))
    val targeted = Router.withTargets(Enrichment.enrich(parsed, spark), cfg.routeRules)
      .observe(obsRoute,
        count(lit(1)).as("rows_in"),
        sum(when(col("targets") === array(lit(Router.DeadLetter)), 1L)
          .otherwise(0L)).as("rows_dead_letter"))
    val fanned = Router.explodeTargets(targeted)

    val manifest = new Manifest(outRoot)
    val already = manifest.committedSinks()

    // observe() = runtime-visible counters with zero extra passes — the
    // reference's live Stats (monitoring/stats.go:10-118) as Spark metrics.
    // Attached to the staging write, the job's one pass over the fact table.
    val obs = new org.apache.spark.sql.Observation(s"graft_metrics_$runId")
    val observed = fanned.observe(obs,
      count(lit(1)).as("routed_rows"),
      sum(octet_length(col("text"))).as("routed_bytes"),
      approx_count_distinct(col("sink")).as("sinks")) // observe() forbids exact distinct aggs

    val staging = s"$outRoot/_staging"
    // cells AND exact per-final-sink commit stats from the limiter's ONE
    // pruned scan of the staged files — run() itself performs zero passes
    // over staged data (the round-2 shape re-read the staged conv_id column
    // of everything just written for the countDistinct)
    val (_, cells, stats) =
      SinglePassLimit.writeLimitedWithStats(observed, cfg.limitRules, staging)

    var written = 0
    stats.keys.toSeq.sorted.filterNot(already.contains).foreach { sink =>
      if (written < failAfterSinks) {
        val (rows, bytes, convs) = stats(sink)
        manifest.promoteAndCommit(sink,
          java.nio.file.Paths.get(staging, s"sink=$sink"), runId, rows, bytes, convs)
        written += 1
      }
    }

    // Persist the observed run metrics next to the lineage entries (A1/A2) —
    // the staging write always ran, so obs.get never blocks. The per-sink
    // in/out/dropped counters come from the limiter's verdict cells, i.e.
    // they were observed DURING the run with zero extra passes — the
    // reference's live per-connection Stats (monitoring/stats.go:10-118,
    // served at web/api/targets.go:43-121) as a run artifact.
    val m = obs.get
    val perSinkJson = {
      final case class C(var inRows: Long = 0, var inBytes: Long = 0,
          var outRows: Long = 0, var outBytes: Long = 0,
          var droppedRows: Long = 0, var droppedBytes: Long = 0)
      val bySink = scala.collection.mutable.SortedMap[String, C]()
      cells.foreach { c =>
        val in = bySink.getOrElseUpdate(c.origSink, C())
        in.inRows += c.rows; in.inBytes += c.bytes
        if (c.curSink == null) {
          val d = bySink.getOrElseUpdate(c.lastSink, C())
          d.droppedRows += c.rows; d.droppedBytes += c.bytes
        } else {
          val out = bySink.getOrElseUpdate(c.curSink, C())
          out.outRows += c.rows; out.outBytes += c.bytes
        }
      }
      bySink.map { case (s, c) =>
        s""""$s":{"in_rows":${c.inRows},"in_bytes":${c.inBytes},""" +
          s""""out_rows":${c.outRows},"out_bytes":${c.outBytes},""" +
          s""""dropped_rows":${c.droppedRows},"dropped_bytes":${c.droppedBytes}}"""
      }.mkString("{", ",", "}")
    }
    // per-stage counters (sources/workers parity) — all observed on the one
    // staging pass; see the conservation invariants at the observe() sites
    val mScan = obsScan.get
    val mParse = obsParse.get
    val mRoute = obsRoute.get
    val stagesJson =
      s"""{"scan":{"rows":${mScan("rows")}},""" +
        s""""parse":{"rows_ok":${mParse("rows_ok")},""" +
        s""""rows_quarantined":${mParse("rows_quarantined")}},""" +
        s""""route":{"rows_in":${mRoute("rows_in")},""" +
        s""""rows_dead_letter":${mRoute("rows_dead_letter")},""" +
        s""""fanout_rows":${m("routed_rows")}}}"""
    val metricsJson = s"""{"run_id":"$runId","routed_rows":${m("routed_rows")},""" +
      s""""routed_bytes":${m("routed_bytes")},"sinks":${m("sinks")},""" +
      s""""stages":$stagesJson,"per_sink":$perSinkJson}"""
    // tmp + atomic move: the metrics HTTP sidecar may scrape this file at
    // any moment, and a crash mid-write must not leave a truncated record
    val metricsTmp = java.nio.file.Paths.get(outRoot, "_tmp", s"_metrics_$runId.json")
    java.nio.file.Files.createDirectories(metricsTmp.getParent)
    java.nio.file.Files.writeString(metricsTmp, metricsJson)
    java.nio.file.Files.move(metricsTmp,
      java.nio.file.Paths.get(outRoot, "_manifest", s"_metrics_$runId.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    // drop the staging residue once every staged sink is committed
    if (stats.keySet.subsetOf(new Manifest(outRoot).committedSinks()))
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(staging))

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
