package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.model.Transcripts
import graft.parse.GrokParser
import graft.route.Router

/** ScalaCheck-generated properties over the routing algebra (SURVEY.md §5f):
  * routing total = Σ per-sink; parse(generate(x)) == x. Uses bare Gen with a
  * fixed seed (no scalatestplus bridge in the offline cache) so runs are
  * deterministic. */
class RoutingPropertySpec extends SparkSpec {

  private val shapes: Seq[(Int, Int, Int)] = {
    val gen = for {
      convs <- Gen.choose(1, 20)
      turns <- Gen.choose(1, 12)
      hot <- Gen.choose(0, 30)
    } yield (convs, turns, hot)
    Gen.listOfN(6, gen)(Gen.Parameters.default, Seed(42L)).get
  }

  test("property: fan-out conserves rows (total = Σ per-sink incl. dead-letter)") {
    shapes.foreach { case (convs, turnsPerConv, hot) =>
      val turns = Transcripts.synthetic(spark, convs, turnsPerConv, hot)
      val parsed = GrokParser.parse(turns)
      val routed = Router.fanOut(parsed)
      val perSink = routed.groupBy("sink").count()
        .collect().map(_.getLong(1)).sum
      assert(perSink === routed.count(), s"shape ($convs,$turnsPerConv,$hot)")
      // each input turn appears at least once (dead-letter catches the rest)
      val distinctTurns = routed.select("conv_id", "turn_idx").distinct().count()
      assert(distinctTurns === turns.count(), s"shape ($convs,$turnsPerConv,$hot)")
    }
  }

  test("property: generated text reparses to the generating fields") {
    shapes.foreach { case (convs, turnsPerConv, hot) =>
      val turns = Transcripts.synthetic(spark, convs, turnsPerConv, hot)
      val parsed = GrokParser.parsed(turns)
      val mismatched = parsed.filter(
        regexp_extract(col("text"), GrokParser.Pattern, 2) =!= col("tool") ||
          col("level").isNull || col("status").isNull || col("dur_ms").isNull)
      assert(mismatched.count() === 0, s"shape ($convs,$turnsPerConv,$hot)")
    }
  }
}
