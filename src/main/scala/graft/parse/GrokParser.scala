package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vectorized grok/regex parse stage.
  *
  * Extracts structured fields from each turn's `text`. Rows that do not match
  * the pattern get null `level` and are later routed to the quarantine /
  * dead-letter sink — the reference's analog is a protobuf decode failure,
  * which is dropped with a counter (reference broker/worker.go:70-74).
  *
  * Implementation notes (scale):
  *  - One `regexp_extract_all` call per row, exploded into fields via
  *    element_at — NOT five independent `regexp_extract` calls; Catalyst
  *    does not CSE non-deterministic-free regex calls reliably across
  *    projections, and at 10^12 rows regex evaluation dominates the scan.
  *  - Everything stays inside whole-stage codegen (built-in expressions only).
  */
object GrokParser {

  /** `[LEVEL] tool=T dur=Nms status=S payload` */
  val Pattern = "^\\[(ERROR|WARN|INFO)\\] tool=([a-z]+) dur=([0-9]+)ms status=(ok|err) (.*)$"

  /** Adds level/dur_ms/status/payload columns; non-matching rows → nulls.
    * ONE regex execution per row via the custom [[GrokExtract]] expression
    * (built-in regexp_extract would cost one execution per field — 5× the
    * regex work on the 10^12-row hot path; Catalyst does not CSE them). */
  def parse(turns: DataFrame): DataFrame =
    turns
      .withColumn("_g", GrokExtract.grok_extract(col("text"), Pattern))
      .withColumn("level", col("_g.level"))
      .withColumn("dur_ms", col("_g.dur_ms"))
      .withColumn("status", col("_g.status"))
      .withColumn("payload", col("_g.payload"))
      .drop("_g")

  /** Well-formed rows only. */
  def parsed(turns: DataFrame): DataFrame = parse(turns).filter(col("level").isNotNull)

  /** Quarantined rows (parse failures) — the dead-letter input. */
  def quarantined(turns: DataFrame): DataFrame = parse(turns).filter(col("level").isNull)
}
