package graft

import graft.agg.Retention
import org.apache.spark.sql.functions._

/** Exact vs approximate cohort retention: the HLL swap must reproduce the
  * exact matrix within its advertised error on real data, and its plan must
  * shuffle sketches, not the distinct expansion. */
class RetentionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def events = spark.read.parquet(s"$sfDir/events.parquet")
    .select(col("user_id"),
      expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))

  test("cohortMatrixApprox tracks the exact matrix within the HLL error bound") {
    val exact = Retention.cohortMatrix(events, col("user_id"), col("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val approx = Retention.cohortMatrixApprox(events, col("user_id"), col("day"), rsd = 0.02)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(approx.keySet === exact.keySet, "same (cohort, offset) cells")
    exact.foreach { case (cell, n) =>
      val a = approx(cell).toDouble
      // HLL++ rsd=0.02 is a STANDARD error; allow 5 sigma plus small-count slack
      assert(math.abs(a - n) <= math.max(2.0, 0.10 * n),
        s"cell $cell: exact=$n approx=$a")
    }
  }

  test("approx partials are fixed-size sketches; exact partials are per-entity rows " +
      "(the final exchange is matrix-sized vs entity-sized)") {
    graft.tools.PlanPin.withStaticPlans(spark) {
      val exactPlan = Retention.cohortMatrix(events, col("user_id"), col("day"))
        .queryExecution.executedPlan.toString
      val approxPlan = Retention.cohortMatrixApprox(events, col("user_id"), col("day"))
        .queryExecution.executedPlan.toString
      // exact: the distinct rewrite keeps the entity in an aggregate key
      // (one row per (cell, entity) feeds the final exchange); the window's
      // entity clustering means no EXTRA exchange — volume is the cost
      assert(exactPlan.contains("partial_count(distinct") ||
        "keys=\\[[^\\]]*__ent".r.findFirstIn(exactPlan).isDefined,
        s"exact form should aggregate per (cell, entity):\n${exactPlan.take(1500)}")
      // approx: partial HLL sketches, and the entity appears in NO aggregate
      // key after the window — the final exchange carries sketches only
      assert(approxPlan.contains("partial_approx_count_distinct"),
        s"approx form should ship mergeable sketches:\n${approxPlan.take(1500)}")
      val aggKeys = "keys=\\[[^\\]]*\\]".r.findAllIn(approxPlan).toSeq
      assert(aggKeys.nonEmpty && !aggKeys.exists(_.contains("__ent")),
        s"approx aggregate keys must not include the entity: $aggKeys")
    }
  }
}
