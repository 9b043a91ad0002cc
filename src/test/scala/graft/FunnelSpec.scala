package graft

import graft.agg.Funnel
import org.apache.spark.sql.functions._

/** Semantics + plan tests for ordered-funnel analysis. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, String, Long, Long)]): Map[Long, Int] =
    Funnel.depth(rows.toDF("ent", "t", "ts", "id"),
        col("ent"), col("t"), col("ts"), col("id"), stages)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("stage order is enforced: out-of-order stages do not count") {
    val got = run(Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "purchase", 30L, 3L), // full funnel
      (2L, "purchase", 10L, 4L), (2L, "click", 20L, 5L), (2L, "view", 30L, 6L), // reversed: view only
      (3L, "click", 10L, 7L), (3L, "view", 20L, 8L), (3L, "purchase", 30L, 9L), // skip click: view+purchase? no — click was BEFORE view
      (4L, "error", 10L, 10L),                                                  // no stage events
      (5L, "view", 10L, 11L), (5L, "purchase", 20L, 12L)))                      // no click: depth 1
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 1))
  }

  test("at-or-after: a later-tie event at the same timestamp completes the next stage") {
    val got = run(Seq(
      (1L, "view", 10L, 1L), (1L, "click", 10L, 2L),   // same ts, click ordered after view by tie
      (2L, "click", 10L, 1L), (2L, "view", 10L, 2L)))  // tie order reversed: click before view
    assert(got === Map(1L -> 2, 2L -> 1))
  }

  test("repeat stages: the FIRST stage completion anchors the next stage") {
    val got = run(Seq(
      (1L, "view", 10L, 1L), (1L, "view", 50L, 2L), (1L, "click", 20L, 3L)))
    assert(got === Map(1L -> 2)) // click@20 is after first view@10
  }

  test("cohort retention: anchor, offsets, and the offset-0 dominance invariant") {
    val got = graft.agg.Retention.cohortMatrix(
        Seq((1L, 10L), (1L, 12L), (2L, 10L), (2L, 10L), (3L, 12L), (3L, 13L))
          .toDF("u", "d"), col("u"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // cohort day-10 = {1, 2}: both at offset 0, only user 1 back at offset 2
    // cohort day-12 = {3}: offset 0 and 1
    assert(got === Map((10L, 0L) -> 2L, (10L, 2L) -> 1L, (12L, 0L) -> 1L, (12L, 1L) -> 1L))
    // real data: every offset cell is bounded by its cohort's size
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
    val m = graft.agg.Retention.cohortMatrix(e, col("user_id"), col("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m.nonEmpty)
    m.foreach { case ((c, off), n) =>
      assert(n <= m((c, 0L)), s"cohort $c offset $off: $n > size ${m((c, 0L))}")
    }
  }

  test("one exchange for the whole funnel: windows and aggregate share the entity partitioning") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("event_type"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("e_us"))
    val d = Funnel.depth(e, col("user_id") * 100000L + expr("e_us div 86400000000L"),
      col("event_type"), col("e_us"), col("event_id"), stages)
    graft.tools.PlanPin.withStaticPlans(spark) {
      val st = graft.tools.PlanPin.stats(d)
      assert(st.shuffleExchanges === 1, st.toString)
    }
    val hist = d.groupBy("depth").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist.keySet.subsetOf(Set(0, 1, 2, 3)) && hist.values.sum > 0)
  }
}
