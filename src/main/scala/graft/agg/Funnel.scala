package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — per entity, how far through a stage sequence
  * (view → click → purchase, …) did its event stream progress, where stage
  * i+1 only counts if it happens at-or-after the entity's FIRST completion
  * of stage i (by the (ts, tie) total order).
  *
  * Shape: one running `min(when(hit_i, ts))` window per stage, all chained
  * on the SAME (partition, order) — Spark stacks the Window operators over
  * ONE exchange and one sort, and the final per-entity aggregate reuses the
  * window's hash partitioning, so the whole funnel costs a single shuffle
  * of the event stream regardless of stage count (FunnelSpec pins the
  * 1-exchange plan). Per-row depth is monotone within an entity, so the
  * aggregate is a plain max — no second pass, no self-joins (the naive
  * formulation joins the stream to itself once per stage). */
object Funnel {

  /** One row per entity: (entity, depth) with depth in 0..stages.length —
    * 0 = never hit the first stage. `tie` must make (ts, tie) a total order
    * per entity or stage attribution on equal timestamps is nondeterministic.
    * Events at the exact timestamp of the previous stage's first completion
    * count as "after" (at-or-after, matching the as-of convention). */
  def depth(events: DataFrame, entity: Column, stageType: Column, ts: Column,
      tie: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(entity.as("__ent"), stageType.as("__type"),
      ts.as("__ts"), tie.as("__tie"))
    val w = Window.partitionBy(col("__ent")).orderBy(col("__ts"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = stages.zipWithIndex.foldLeft(base) { case (df, (st, i)) =>
      val hit = col("__type") === st &&
        (if (i == 0) lit(true) else col(s"__m${i - 1}").isNotNull)
      df.withColumn(s"__m$i", min(when(hit, col("__ts"))).over(w))
    }
    // highest stage checked first; monotone per row → max = final depth
    val rowDepth = stages.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"__m$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    staged.groupBy(col("__ent"))
      .agg(max(rowDepth).as("depth"))
      .select(col("__ent").as("entity"), col("depth"))
  }
}
