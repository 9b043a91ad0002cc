package graft.limit

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed-average rate limiting with fallback/discard rerouting.
  *
  * Reference semantics (limiter/limiter.go):
  *  - L1 time-bucketed byte counters keyed floor(now/interval)   → tumbling window agg
  *  - L4 sliding-average check: mean of the last `buckets` intervals vs limit
  *                                                                → analytic window frame
  *  - breach dispatch (broker/connector.go:268-313): action=fallback rewrites
  *    the target, action=discard drops the row (counted).
  *
  * Batch divergence (documented, SURVEY.md §7 hard part b): the reference's
  * limiter is an ONLINE feedback loop — each delivery increments the counter
  * that gates the next delivery. A batch job computes breach verdicts from the
  * tumbling aggregates of the FIRST-pass routing, then applies the reroute
  * once per limiter hop (primary → fallback → discard = two passes). Verdict
  * granularity is the whole bucket, not the mid-bucket overflow point.
  *
  * Scale: verdicts are one row per (sink, bucket) — tiny relative to the fact
  * table — so the verdict join back onto routed rows is a broadcast join.
  */
final case class LimitRule(
    sink: String,
    bytesPerBucket: Long,
    avgOverBuckets: Int,
    action: String, // "fallback" | "discard"
    fallbackSink: Option[String]
)

object RateLimit {

  /** Default limiter chain, mirroring the reference dummy.yaml:26-55:
    * sink_search is average-limited with fallback → sink_fallback;
    * sink_fallback is limited with discard. */
  def defaultRules(searchLimit: Long = 6000L, fallbackLimit: Long = 4000L): Seq[LimitRule] = Seq(
    LimitRule("sink_search", searchLimit, 3, "fallback", Some("sink_fallback")),
    LimitRule("sink_fallback", fallbackLimit, 3, "discard", None)
  )

  def bucketCol(ts: Column): Column = date_trunc("hour", ts)

  /** L1: tumbling per-(sink, bucket) byte sums. */
  def bucketBytes(routed: DataFrame): DataFrame =
    routed
      .groupBy(col("sink"), bucketCol(col("ts")).as("bucket"))
      .agg(sum(octet_length(col("text"))).as("bucket_bytes"))

  /** L4: sliding average over the trailing `avgOverBuckets` buckets per sink,
    * plus the breach verdict for one rule. */
  def breachVerdicts(routed: DataFrame, rule: LimitRule): DataFrame = {
    val frame = Window
      .partitionBy(col("sink"))
      .orderBy(col("bucket"))
      .rowsBetween(-(rule.avgOverBuckets - 1), Window.currentRow)
    bucketBytes(routed.filter(col("sink") === rule.sink))
      .withColumn("avg_bytes", avg(col("bucket_bytes")).over(frame))
      .withColumn("breached", col("avg_bytes") > rule.bytesPerBucket)
  }

  /** Applies one limiter chain pass-by-pass: for each rule in order, rows in
    * breached (sink, bucket) windows are rerouted to the fallback sink or
    * dropped. Returns (surviving routed rows, dropped-row count DataFrame).
    */
  def apply(routed: DataFrame, rules: Seq[LimitRule]): (DataFrame, DataFrame) = {
    val spark = routed.sparkSession
    import spark.implicits._
    var current = routed
    var droppedParts = List.empty[DataFrame]
    rules.foreach { rule =>
      val verdicts = breachVerdicts(current, rule)
        .filter(col("breached"))
        .select(col("sink").as("v_sink"), col("bucket").as("v_bucket"))
      val joined = current.join(
        broadcast(verdicts),
        current("sink") === col("v_sink") &&
          bucketCol(current("ts")) === col("v_bucket"),
        "left")
      val breachedRow = col("v_sink").isNotNull
      rule.action match {
        case "fallback" =>
          current = joined
            .withColumn(
              "sink",
              when(breachedRow, lit(rule.fallbackSink.get)).otherwise(col("sink")))
            .drop("v_sink", "v_bucket")
        case "discard" =>
          droppedParts ::= joined.filter(breachedRow).drop("v_sink", "v_bucket")
          current = joined.filter(!breachedRow).drop("v_sink", "v_bucket")
      }
    }
    val dropped = droppedParts match {
      case Nil => routed.limit(0)
      case h :: t => t.foldLeft(h)(_ unionByName _)
    }
    (current, dropped)
  }
}
