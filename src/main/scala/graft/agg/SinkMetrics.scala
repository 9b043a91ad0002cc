package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-sink / per-conversation aggregates — the engine's GROUP BY metrics.
  *
  * Reference analog: per-connection/per-worker Stats counters
  * (reference monitoring/stats.go:10-118) exposed over the JSON API
  * (reference web/api/targets.go:43-121). Here they are hash aggregates with
  * map-side partial aggregation (Spark's default), so the shuffle carries
  * one row per (sink) / (sink, conv) per input partition — not per turn.
  */
object SinkMetrics {

  /** count + bytes + distinct convs per sink. */
  def perSink(routed: DataFrame): DataFrame =
    routed
      .groupBy(col("sink"))
      .agg(
        count(lit(1)).as("turns"),
        sum(octet_length(col("text"))).as("bytes"),
        countDistinct(col("conv_id")).as("convs"))

  /** Per-conversation turn spans: min/max turn_idx + count.
    * north_star: "per-conv_id turn spans via window over conv_id ordered by
    * turn_idx" — a groupBy is the shuffle-equivalent, cheaper formulation
    * (no per-row window output needed, only the span). */
  def convSpans(turns: DataFrame): DataFrame =
    turns
      .groupBy(col("conv_id"))
      .agg(
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"),
        count(lit(1)).as("n_turns"))

  /** Spans per (sink, conv) over routed output. */
  def perSinkConvSpans(routed: DataFrame): DataFrame =
    routed
      .groupBy(col("sink"), col("conv_id"))
      .agg(
        min(col("turn_idx")).as("first_turn"),
        max(col("turn_idx")).as("last_turn"),
        count(lit(1)).as("n_turns"))
}
