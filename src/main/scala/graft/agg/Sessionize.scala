package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based conversation sessionization — the classic log-analytics
  * operator the reference's consumers run downstream of the pipeline
  * (cf. /root/reference/monitoring/stats.go:10-118 exposing per-connection
  * activity: a "session" is the unit those counters describe): within a
  * conversation, a new session starts when the gap since the previous turn
  * exceeds `gapSeconds`.
  *
  * Construction: lag → boundary flag → running sum = session index. Both
  * windows share the (conv_id) partition and (ts, turn_idx) order, so the
  * physical plan carries ONE exchange and one sort (SessionizeSpec pins
  * this). At 100 TB this is the minimum possible for the semantics: any
  * sessionizer must co-locate a conversation's turns once.
  *
  * [[sessions]] is the per-session rollup; its streaming twin is Spark's
  * built-in `session_window` aggregation (same gap-merge semantics —
  * SessionizeSpec proves the two agree turn-for-turn, which also
  * cross-validates this construction against Spark's implementation).
  */
object Sessionize {

  /** Exact microsecond epoch. The cast lifts parquet's TIMESTAMP_NTZ to
    * session-TZ TIMESTAMP (identity under the UTC sessions this engine
    * pins), which `unix_micros` requires. */
  private def micros(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  /** Per-turn session index (0-based, dense within a conversation). The gap
    * compares exact microsecond epochs (`unix_micros` ⇄ DuckDB `epoch_us`)
    * — second-truncating forms would disagree across engines on gaps that
    * straddle the threshold by a fraction of a second. The boundary is
    * half-open (a gap of EXACTLY `gapSeconds` starts a new session, `>=`),
    * matching Spark's `session_window` [t, t+gap) convention exactly — so
    * the streaming twin and this operator agree on every input, including
    * the boundary. */
  def sessionize(turns: DataFrame, gapSeconds: Long = 86400L): DataFrame = {
    val byConv = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("turn_idx"))
    val prev = lag(col("ts"), 1).over(byConv)
    val newSess = when(
      prev.isNull || micros(col("ts")) - micros(prev) >= gapSeconds * 1000000L,
      lit(1)).otherwise(lit(0))
    turns
      .withColumn("session_idx",
        (sum(newSess).over(byConv.rowsBetween(Window.unboundedPreceding, 0)) - 1)
          .cast("long"))
  }

  /** Per-session rollup: turn count and exact epoch-microsecond span
    * (bigints — raw timestamps never cross the engine-comparison
    * boundary). */
  def sessions(turns: DataFrame, gapSeconds: Long = 86400L): DataFrame =
    sessionize(turns, gapSeconds)
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(micros(col("ts"))).as("start_us"),
        max(micros(col("ts"))).as("end_us"))

  /** Session-aware sequence packing — [[sessionize]] composed into the
    * curation DAG's concat-and-chunk packer at SESSION granularity: the
    * packable unit is a whole session, so a session can never straddle a
    * pack boundary (the invariant a conversation-aware training loader
    * needs — [[graft.text.TextAnalysis.packs]] documents the first-token
    * assignment rule this inherits).
    *
    * Plan shape: the sessionize windows and the session rollup share the
    * (conv_id) partitioning (hashpartitioning(conv_id) satisfies the
    * (conv_id, session_idx) clustering — no second exchange), then ONE
    * re-key to (shard) for the per-shard prefix-sum window; parallelism =
    * nShards, no global sort — the same scale shape as document packing.
    * The shard key derives from the conv id's numeric suffix so the DuckDB
    * twin is engine-portable (xxhash64 does not cross engines); the input
    * contract is the input_hint transcript schema (`conv-NNNNN` ids) — a
    * non-conforming id would yield a null shard, which the per-row
    * raise_error guard turns into a fail-fast instead of a silently
    * misplaced pack. */
  def sessionPacks(turns: DataFrame, gapSeconds: Long = 86400L,
      maxTokens: Int = 512, nShards: Int = 8): DataFrame = {
    val sess = sessionize(turns, gapSeconds)
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(sum(graft.text.TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"))
      // id-shape contract enforced on the WHOLE id (a bare null-check after
      // substring(…, 6, 5) would silently truncate a longer numeric suffix —
      // 'conv-123456' sharding on '12345' — instead of failing); 18 digits is
      // the full Long-safe width, so every conforming id shards on its entire
      // suffix
      // isNull checked explicitly: `!rlike` is NULL (not true) for a null id,
      // which would skip the guard and emit a silent null shard
      .withColumn("shard", when(col("conv_id").isNull ||
          !col("conv_id").rlike("^conv-[0-9]{1,18}$"),
        raise_error(concat(lit("sessionPacks: conv_id does not match conv-<digits>: "),
          coalesce(col("conv_id"), lit("NULL")))).cast("long"))
        .otherwise(pmod(substring(col("conv_id"), 6, 18).cast("long"), lit(nShards))))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("conv_id"), col("session_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sess
      .withColumn("pack_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / maxTokens).cast("long"))
      .select(col("conv_id"), col("session_idx"), col("n_tokens"),
        col("shard"), col("pack_id"))
  }
}
