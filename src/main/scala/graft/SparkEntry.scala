package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Transcripts
import graft.parse.GrokParser
import graft.enrich.Enrichment
import graft.route.Router
import graft.agg.SinkMetrics
import graft.limit.RateLimit

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one operator from SURVEY.md §2; every `oracleSql`
  * entry is its DuckDB twin (CTE prelude in [[Oracles]]). Column names are
  * aliased identically on both sides (the driver sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  // ---- shared stage composition (parse → enrich → route → fan-out) ----
  private def turns(s: SparkSession, dir: String): DataFrame =
    Transcripts.fromEvents(s, dir)
  private def parsedTurns(s: SparkSession, dir: String): DataFrame =
    GrokParser.parse(turns(s, dir))
  private def routed(s: SparkSession, dir: String): DataFrame =
    Router.fanOut(parsedTurns(s, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SinkMetrics.perSink(routed(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/P1: scan + derivation (the transcript table itself)
    "q_turns" -> ((s, dir) =>
      turns(s, dir).select(col("conv_id"), col("turn_idx"), col("role"),
        col("text"), col("tool"))),
    // P5/S5 + §2.3: grok/regex parse stage — level/status distribution
    "q_parse_stats" -> ((s, dir) =>
      parsedTurns(s, dir)
        .groupBy(col("level"), col("status"))
        .agg(count(lit(1)).as("n"), sum(col("dur_ms")).as("total_dur"))),
    // R1/R2: router fan-out — per-sink counts
    "q_route_counts" -> ((s, dir) =>
      routed(s, dir).groupBy(col("sink")).agg(count(lit(1)).as("turns"))),
    // routed-row equality (full content, per-turn text)
    "q_routed_rows" -> ((s, dir) =>
      routed(s, dir).select(col("conv_id"), col("turn_idx"), col("sink"), col("text"))),
    // A1: per-sink aggregates (count, bytes, distinct convs)
    "q_sink_agg" -> ((s, dir) => SinkMetrics.perSink(routed(s, dir))),
    // A1: per-conv turn spans
    "q_conv_spans" -> ((s, dir) => SinkMetrics.convSpans(turns(s, dir))),
    // R1 broadcast enrich: per-(team, cost_class) rollup
    "q_enrich_agg" -> ((s, dir) =>
      Enrichment.enrich(parsedTurns(s, dir), s)
        .groupBy(col("team"), col("cost_class"))
        .agg(count(lit(1)).as("n"), sum(col("dur_ms")).as("total_dur"))),
    // L1: tumbling per-(sink, bucket) byte sums
    "q_limit_buckets" -> ((s, dir) =>
      RateLimit.bucketBytes(routed(s, dir))
        .select(col("sink"), unix_timestamp(col("bucket")).as("bucket_epoch"),
          col("bucket_bytes"))),
    // L4+R3/R4: full limiter chain (fallback then discard) — surviving per-sink totals
    "q_limit_final" -> ((s, dir) => {
      val (survived, _) = RateLimit.apply(routed(s, dir), RateLimit.defaultRules(150L, 120L))
      survived.groupBy(col("sink"))
        .agg(count(lit(1)).as("turns"), sum(octet_length(col("text"))).as("bytes"))
    }),
    // R4: discarded rows (full keys, for row-set equality)
    "q_limit_dropped" -> ((s, dir) => {
      val (_, dropped) = RateLimit.apply(routed(s, dir), RateLimit.defaultRules(150L, 120L))
      dropped.select(col("conv_id"), col("turn_idx"), col("sink"))
    }),
    // F2: idempotent-resume anti-join against a committed-keys manifest
    "q_resume_antijoin" -> ((s, dir) => {
      val r = routed(s, dir)
      val committed = r
        .filter(pmod(split(col("conv_id"), "-").getItem(1).cast("int"), lit(2)) === 0)
        .select(col("conv_id"), col("turn_idx"), col("sink"))
      r.join(committed, Seq("conv_id", "turn_idx", "sink"), "left_anti")
        .groupBy(col("sink")).agg(count(lit(1)).as("turns"))
    }),
    // §2.7 union: multi-source merge (events-derived turns ∪ documents-derived turns)
    "q_multisource" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet").select(
        concat(lit("doc-"), lpad(col("doc_id").cast("string"), 5, "0")).as("conv_id"),
        lit(0).cast("int").as("turn_idx"),
        lit("user").as("role"),
        col("text").as("text"),
        lit("none").as("tool"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
      turns(s, dir).unionByName(docs)
        .groupBy(split(col("conv_id"), "-").getItem(0).as("source_kind"))
        .agg(count(lit(1)).as("n"), sum(octet_length(col("text"))).as("bytes"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_turns" -> Oracles.withPipeline(
      "SELECT conv_id, turn_idx, role, text, tool FROM turns"),
    "q_parse_stats" -> Oracles.withPipeline(
      """SELECT level, status, count(*) AS n,
         cast(sum(dur_ms) AS bigint) AS total_dur
         FROM turns GROUP BY level, status"""),
    "q_route_counts" -> Oracles.withPipeline(
      "SELECT sink, count(*) AS turns FROM routed GROUP BY sink"),
    "q_routed_rows" -> Oracles.withPipeline(
      "SELECT conv_id, turn_idx, sink, text FROM routed"),
    "q_sink_agg" -> Oracles.withPipeline(
      """SELECT sink, count(*) AS turns,
         cast(sum(strlen(text)) AS bigint) AS bytes,
         count(DISTINCT conv_id) AS convs
         FROM routed GROUP BY sink"""),
    "q_conv_spans" -> Oracles.withPipeline(
      """SELECT conv_id, min(turn_idx) AS first_turn, max(turn_idx) AS last_turn,
         count(*) AS n_turns FROM turns GROUP BY conv_id"""),
    "q_enrich_agg" -> Oracles.withPipeline(
      """SELECT team, cost_class, count(*) AS n,
         cast(sum(dur_ms) AS bigint) AS total_dur
         FROM turns LEFT JOIN tool_dim USING (tool)
         GROUP BY team, cost_class"""),
    "q_limit_buckets" -> Oracles.withPipeline(
      """SELECT sink, cast(epoch(date_trunc('hour', ts)) AS bigint) AS bucket_epoch,
         cast(sum(strlen(text)) AS bigint) AS bucket_bytes
         FROM routed GROUP BY sink, date_trunc('hour', ts)"""),
    "q_limit_final" -> Oracles.withLimits(
      """SELECT sink, count(*) AS turns,
         cast(sum(strlen(text)) AS bigint) AS bytes
         FROM r2 GROUP BY sink"""),
    "q_limit_dropped" -> Oracles.withLimits(
      "SELECT conv_id, turn_idx, sink FROM d2"),
    "q_resume_antijoin" -> Oracles.withPipeline(
      """SELECT sink, count(*) AS turns FROM routed
         WHERE cast(split_part(conv_id, '-', 2) AS int) % 2 <> 0
         GROUP BY sink"""),
    "q_multisource" -> Oracles.withPipeline(
      """SELECT split_part(conv_id, '-', 1) AS source_kind, count(*) AS n,
         cast(sum(strlen(text)) AS bigint) AS bytes
         FROM (SELECT conv_id, text FROM turns
               UNION ALL
               SELECT 'doc-' || lpad(cast(doc_id AS varchar), 5, '0') AS conv_id, text
               FROM documents)
         GROUP BY 1""")
  )
}
