package graft

/** DuckDB-SQL twins of the engine's derivation + routing stages.
  *
  * The driver runs each [[SparkEntry.oracleSql]] string in DuckDB against the
  * same parquet tables (registered by bare table name) and hash-compares the
  * result with the Spark output. These CTEs MUST stay semantically identical
  * to [[graft.model.Transcripts.fromEvents]], [[graft.parse.GrokParser]],
  * [[graft.enrich.Enrichment]] and [[graft.route.Router.defaultRules]].
  *
  * Cross-engine function discipline: only constructs with identical
  * Spark/DuckDB semantics are used — lpad, row_number, CASE, ||/concat,
  * floor+cast (NOT bare double→int cast: Spark truncates, DuckDB rounds),
  * strlen (DuckDB) vs octet_length (Spark), date_trunc, epoch seconds as
  * bigint (never raw timestamps or raw doubles in compared output).
  */
object Oracles {

  /** events.parquet → transcript turns, with the parse stage's structured
    * fields recomputed DIRECTLY from the source columns (no regex) — so the
    * comparison round-trips Spark's generate-text→regex-parse path. */
  val turnsCte: String = """
    SELECT
      'conv-' || lpad(cast(user_id AS varchar), 5, '0') AS conv_id,
      cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int) AS turn_idx,
      CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'assistant'
        WHEN 'signup' THEN 'user' WHEN 'purchase' THEN 'assistant'
        WHEN 'error' THEN 'tool' END AS role,
      CASE WHEN event_id % 17 = 0 THEN '?raw? ' || props
        ELSE '[' || CASE WHEN event_type = 'error' THEN 'ERROR'
                         WHEN event_type = 'signup' THEN 'WARN' ELSE 'INFO' END
          || '] tool=' || CASE event_type WHEN 'click' THEN 'none' WHEN 'view' THEN 'search'
                            WHEN 'signup' THEN 'edit' WHEN 'purchase' THEN 'bash'
                            WHEN 'error' THEN 'bash' END
          || ' dur=' || cast(cast(floor(value * 10) AS bigint) AS varchar)
          || 'ms status=' || CASE WHEN value >= 50 THEN 'ok' ELSE 'err' END
          || ' ' || props END AS text,
      CASE event_type WHEN 'click' THEN 'none' WHEN 'view' THEN 'search'
        WHEN 'signup' THEN 'edit' WHEN 'purchase' THEN 'bash'
        WHEN 'error' THEN 'bash' END AS tool,
      ts,
      CASE WHEN event_id % 17 = 0 THEN NULL
        ELSE CASE WHEN event_type = 'error' THEN 'ERROR'
                  WHEN event_type = 'signup' THEN 'WARN' ELSE 'INFO' END END AS level,
      CASE WHEN event_id % 17 = 0 THEN NULL
        ELSE cast(floor(value * 10) AS int) END AS dur_ms,
      CASE WHEN event_id % 17 = 0 THEN NULL
        ELSE CASE WHEN value >= 50 THEN 'ok' ELSE 'err' END END AS status,
      CASE WHEN event_id % 17 = 0 THEN NULL ELSE props END AS payload
    FROM events"""

  /** Router.defaultRules as UNION ALL branches + the dead-letter complement. */
  val routedCte: String = """
    SELECT *, 'sink_a' AS sink FROM turns
      WHERE level IS NOT NULL AND tool = 'bash' AND role = 'assistant'
    UNION ALL
    SELECT *, 'sink_b' AS sink FROM turns
      WHERE level IS NOT NULL AND role = 'tool'
    UNION ALL
    SELECT *, 'sink_err' AS sink FROM turns
      WHERE level IS NOT NULL AND level IN ('ERROR', 'WARN')
    UNION ALL
    SELECT *, 'sink_search' AS sink FROM turns
      WHERE level IS NOT NULL AND tool = 'search'
    UNION ALL
    SELECT *, 'dead_letter' AS sink FROM turns
      WHERE level IS NULL OR NOT ((tool = 'bash' AND role = 'assistant')
        OR role = 'tool' OR level IN ('ERROR', 'WARN') OR tool = 'search')"""

  /** Enrichment.toolDim as inline VALUES. */
  val toolDimCte: String = """
    SELECT * FROM (VALUES
      ('bash', 'infra', 'high', false),
      ('search', 'retrieval', 'medium', false),
      ('edit', 'authoring', 'low', true),
      ('none', 'chat', 'low', false)) AS d(tool, team, cost_class, redact)"""

  /** Wraps a SELECT body with the standard CTE prelude. */
  def withPipeline(body: String): String =
    s"WITH turns AS ($turnsCte), routed AS ($routedCte), tool_dim AS ($toolDimCte) $body"

  /** Rate-limit chain (limit.RateLimit.defaultRules):
    * pass 1: sink_search avg(bytes/bucket over trailing 3 buckets) > 150 → reroute to sink_fallback;
    * pass 2: sink_fallback avg > 120 → discard.
    * r2 = surviving rows, d2 = discarded rows. */
  val limitCtes: String = """
    bb1 AS (
      SELECT date_trunc('hour', ts) AS bucket, sum(strlen(text)) AS bucket_bytes
      FROM routed WHERE sink = 'sink_search' GROUP BY 1),
    v1 AS (
      SELECT bucket FROM (
        SELECT bucket, avg(bucket_bytes) OVER
          (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS a
        FROM bb1) WHERE a > 150.0),
    r1 AS (
      SELECT r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts,
        CASE WHEN r.sink = 'sink_search' AND v1.bucket IS NOT NULL
             THEN 'sink_fallback' ELSE r.sink END AS sink
      FROM routed r LEFT JOIN v1
        ON r.sink = 'sink_search' AND date_trunc('hour', r.ts) = v1.bucket),
    bb2 AS (
      SELECT date_trunc('hour', ts) AS bucket, sum(strlen(text)) AS bucket_bytes
      FROM r1 WHERE sink = 'sink_fallback' GROUP BY 1),
    v2 AS (
      SELECT bucket FROM (
        SELECT bucket, avg(bucket_bytes) OVER
          (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS a
        FROM bb2) WHERE a > 120.0),
    r2 AS (
      SELECT r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts, r.sink
      FROM r1 r LEFT JOIN v2
        ON r.sink = 'sink_fallback' AND date_trunc('hour', r.ts) = v2.bucket
      WHERE v2.bucket IS NULL),
    d2 AS (
      SELECT r.conv_id, r.turn_idx, r.sink
      FROM r1 r JOIN v2
        ON r.sink = 'sink_fallback' AND date_trunc('hour', r.ts) = v2.bucket)"""

  def withLimits(body: String): String =
    s"WITH turns AS ($turnsCte), routed AS ($routedCte), $limitCtes $body"
}
