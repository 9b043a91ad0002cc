package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.limit.{LimitRule, RateLimit}
import graft.model.RoutedTurn

/** Windowed-average limiter semantics on a handcrafted fixture — mirrors the
  * reference's limiter tests (reference limiter/limiter_test.go:31-90) and the
  * fallback e2e (reference broker/broker_test.go:47-123). */
class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  private def t(hour: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")

  /** rows per (hour, byte size): sink_search traffic of known volume. */
  private def mk(hour: Int, n: Int, textLen: Int, sink: String = "sink_search"): Seq[RoutedTurn] =
    (0 until n).map(i =>
      RoutedTurn(f"conv-h$hour%02d-$i%03d", i, "user", "x" * textLen, "search", t(hour), sink))

  test("bucketBytes: tumbling hourly sums") {
    val rows = (mk(0, 2, 10) ++ mk(1, 3, 10)).toDF()
    val got = RateLimit.bucketBytes(rows)
      .orderBy("bucket").collect().map(r => r.getLong(2))
    assert(got.toSeq === Seq(20L, 30L))
  }

  test("sliding average breaches only once the trailing-3 mean exceeds the limit") {
    // hours 0..3 carry 10, 10, 100, 10 bytes; limit 20
    // trailing-3 means: 10, 10, 40, 40 → breach at hours 2 and 3
    val rows = (mk(0, 1, 10) ++ mk(1, 1, 10) ++ mk(2, 1, 100) ++ mk(3, 1, 10)).toDF()
    val rule = LimitRule("sink_search", 20, 3, "fallback", Some("sink_fallback"))
    val verdicts = RateLimit.breachVerdicts(rows, rule)
      .orderBy("bucket").collect().map(_.getBoolean(4))
    assert(verdicts.toSeq === Seq(false, false, true, true))
  }

  test("fallback rewrites breached rows; discard drops them and counts") {
    // search: hour0 small (ok), hour1 huge (breach → fallback)
    // fallback rule: tiny limit → those rerouted rows then get discarded
    val rows = (mk(0, 1, 10) ++ mk(1, 5, 100)).toDF()
    val rules = Seq(
      LimitRule("sink_search", 50, 1, "fallback", Some("sink_fallback")),
      LimitRule("sink_fallback", 100, 1, "discard", None))
    val (survived, dropped) = RateLimit.apply(rows, rules)
    val bySink = survived.groupBy("sink").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySink.getOrElse("sink_search", 0L) === 1L) // hour0 survives in place
    assert(bySink.getOrElse("sink_fallback", 0L) === 0L) // rerouted rows breached again
    assert(dropped.count() === 5L)
  }

  test("verdict-cell guard trips when bucket granularity collects too many cells") {
    // 6 distinct (sink, hour) cells with a ceiling of 4 → actionable error
    val rows = (0 until 6).flatMap(h => mk(h, 1, 10)).toDF()
    val rules = Seq(LimitRule("sink_search", 50, 1, "fallback", Some("sink_fallback")))
    val e = intercept[IllegalArgumentException] {
      RateLimit.apply(rows, rules, maxVerdictCells = 4)
    }
    assert(e.getMessage.contains("bucket granularity"))
  }

  test("alert action records the breach but routes nothing away") {
    // the reference declares action=alert but never implemented it
    // (TODO at broker/connector.go:271) — here it must pass rows through
    // unchanged while marking the breached cells
    val rows = (mk(0, 1, 10) ++ mk(1, 5, 100)).toDF()
    val rules = Seq(LimitRule("sink_search", 50, 1, "alert", None))
    val (survived, dropped) = RateLimit.apply(rows, rules)
    assert(survived.count() === 6L && dropped.count() === 0L)
    assert(survived.filter(col("sink") === "sink_search").count() === 6L)
    // chain-level: the breached cell is marked, sink untouched
    val cells = Array(
      RateLimit.Cell("sink_search", 0L, "sink_search", "sink_search", 10L),
      RateLimit.Cell("sink_search", 1L, "sink_search", "sink_search", 500L))
    RateLimit.runChain(cells, rules)
    assert(!cells(0).alerted && cells(1).alerted)
    assert(cells.forall(_.curSink == "sink_search"))
  }

  test("fallback keeps rows when the fallback sink is under its limit") {
    val rows = (mk(0, 1, 10) ++ mk(1, 5, 100)).toDF()
    val rules = Seq(
      LimitRule("sink_search", 50, 1, "fallback", Some("sink_fallback")),
      LimitRule("sink_fallback", 10000, 1, "discard", None))
    val (survived, dropped) = RateLimit.apply(rows, rules)
    assert(survived.filter(col("sink") === "sink_fallback").count() === 5L)
    assert(dropped.count() === 0L)
    // content preserved through the reroute
    val texts = survived.filter(col("sink") === "sink_fallback")
      .select("text").distinct().collect().map(_.getString(0))
    assert(texts.toSeq === Seq("x" * 100))
  }
}
