package graft

import org.apache.spark.sql.functions._
import graft.model.Transcripts
import graft.parse.GrokParser
import graft.route.Router
import graft.agg.SinkMetrics

/** Core routing semantics — mirrors the reference's in-process e2e assertions
  * (reference cmd/run_test.go:69-97, 224-241): per-sink counts, fan-out
  * duplication, full routed-row content, metrics parity. */
class PipelineSpec extends SparkSpec {

  private lazy val turns = Transcripts.synthetic(spark, nConvs = 40, turnsPerConv = 10).cache()
  private lazy val parsed = GrokParser.parse(turns).cache()
  private lazy val routed = Router.fanOut(parsed).cache()

  test("parse: quarantined rows are exactly the malformed ones") {
    val malformed = turns.filter(col("text").startsWith("?raw?")).count()
    assert(malformed > 0, "fixture must include malformed rows")
    assert(GrokParser.quarantined(turns).count() === malformed)
    assert(GrokParser.parsed(turns).count() === turns.count() - malformed)
  }

  test("parse: extracted fields round-trip the generated text") {
    // every well-formed text embeds tool= equal to the tool column
    val bad = GrokParser.parsed(turns)
      .filter(regexp_extract(col("text"), GrokParser.Pattern, 2) =!= col("tool"))
      .count()
    assert(bad === 0)
    // dur_ms and status reparse to non-null on all parsed rows
    assert(GrokParser.parsed(turns).filter(col("dur_ms").isNull || col("status").isNull).count() === 0)
  }

  test("route: fan-out total equals sum of per-rule matches plus dead-letter") {
    val ok = col("level").isNotNull
    val preds = Router.defaultRules.map(_.predicate)
    val perRule = preds.map(p => parsed.filter(ok && p).count()).sum
    val matchedAny = parsed.filter(ok && preds.reduce(_ || _)).count()
    val deadLetter = parsed.count() - matchedAny
    assert(routed.count() === perRule + deadLetter)
    assert(routed.filter(col("sink") === Router.DeadLetter).count() === deadLetter)
  }

  test("route: a turn matching k sinks appears exactly k times, once per sink") {
    val dupCounts = routed.groupBy("conv_id", "turn_idx", "sink").count()
      .filter(col("count") > 1).count()
    assert(dupCounts === 0, "no (turn, sink) pair may repeat")
    // ERROR rows with role=tool match sink_b and sink_err → exactly 2 rows
    val multi = GrokParser.parsed(turns)
      .filter(col("role") === "tool" && col("level") === "ERROR" &&
        !(col("tool") === "bash" && col("role") === "assistant") && col("tool") =!= "search")
    val sample = multi.select("conv_id", "turn_idx").limit(1).collect()
    if (sample.nonEmpty) {
      val (c, t) = (sample(0).getString(0), sample(0).getInt(1))
      val sinks = routed.filter(col("conv_id") === c && col("turn_idx") === t)
        .select("sink").collect().map(_.getString(0)).sorted
      assert(sinks.sameElements(Array("sink_b", "sink_err")))
    }
  }

  test("route: per-turn text is preserved verbatim through the fan-out") {
    val joined = routed.alias("r")
      .join(turns.alias("t"), Seq("conv_id", "turn_idx"))
      .filter(col("r.text") =!= col("t.text"))
    assert(joined.count() === 0)
  }

  test("agg: per-sink turns/bytes match independent recomputation") {
    val agg = SinkMetrics.perSink(routed).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Seq("sink_a", "sink_b", "sink_err") foreach { s =>
      val rows = routed.filter(col("sink") === s)
      val expected = (rows.count(),
        rows.select(sum(octet_length(col("text")))).collect()(0).getLong(0))
      assert(agg(s) === expected, s"sink $s")
    }
  }

  test("agg: conv spans are contiguous 0..n-1 on the synthetic fixture") {
    val bad = SinkMetrics.convSpans(turns)
      .filter(col("first_turn") =!= 0 || col("last_turn") =!= col("n_turns") - 1)
      .count()
    assert(bad === 0)
  }
}
