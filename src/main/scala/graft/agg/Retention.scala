package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention — the "of the users first seen on day D, how many came
  * back on day D+k" matrix behind every retention curve.
  *
  * Shape: one window min over the entity (the cohort anchor — first active
  * period), then a distinct-count per (cohort, offset). The window's hash
  * partitioning on entity is NOT reusable by the (cohort, offset) aggregate
  * (different keys), so the plan is the irreducible two shuffles — entity,
  * then cohort — plus the distinct expansion; there is no formulation with
  * fewer for exact distinct counts. For approximate retention at extreme
  * scale swap the final distinct for approx_count_distinct (HLL state is
  * mergeable per (cohort, offset) cell). */
object Retention {

  /** One row per (cohort, day_offset): cohort = the entity's first active
    * period (`periodExpr` of its earliest event), day_offset = period −
    * cohort, n_active = distinct entities from that cohort active at that
    * offset. Offset 0 row carries each cohort's size. */
  def cohortMatrix(events: DataFrame, entity: Column, period: Column): DataFrame =
    anchored(events, entity, period)
      .groupBy(col("__cohort").as("cohort"), (col("__p") - col("__cohort")).as("day_offset"))
      .agg(countDistinct(col("__ent")).as("n_active"))

  /** The approximate swap the header promises, made concrete: the SAME plan
    * with the final exact distinct replaced by approx_count_distinct. The
    * window's entity partitioning already clusters the distinct triples, so
    * neither form pays an extra exchange — the difference is the ROW VOLUME
    * entering the final (cohort, offset) exchange: the exact form ships one
    * row per (cell, entity) — entity-volume, unbounded per cell; the HLL
    * form ships one FIXED-SIZE mergeable sketch per cell per map partition —
    * matrix-sized. `rsd` is the standard-error knob (Spark's HLL++;
    * 0.02 ⇒ ±2 %). RetentionSpec bounds the error against the exact matrix
    * and asserts the partial-aggregate shapes. */
  def cohortMatrixApprox(events: DataFrame, entity: Column, period: Column,
      rsd: Double = 0.02): DataFrame =
    anchored(events, entity, period)
      .groupBy(col("__cohort").as("cohort"), (col("__p") - col("__cohort")).as("day_offset"))
      .agg(approx_count_distinct(col("__ent"), rsd).as("n_active"))

  private def anchored(events: DataFrame, entity: Column, period: Column): DataFrame =
    events.select(entity.as("__ent"), period.as("__p"))
      .withColumn("__cohort", min(col("__p")).over(Window.partitionBy(col("__ent"))))
}
