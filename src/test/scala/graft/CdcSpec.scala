package graft

import graft.cdc.Cdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** Semantics tests for changelog compaction (MERGE INTO shape). */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  private def snap: DataFrame = Seq(
    (1L, "a", 100L), (2L, "b", 200L), (3L, "c", 300L)
  ).toDF("id", "status", "cents")

  test("upsert, delete, insert, pass-through; highest seq wins; D outranks U") {
    val ch = Seq(
      (1L, "a2", 110L, "U", 1L),  // update existing
      (2L, "b", 200L, "D", 2L),   // delete existing
      (2L, "b9", 999L, "U", 1L),  // superseded by the delete (lower seq)
      (4L, "d", 400L, "I", 1L),   // insert new key
      (5L, "e", 500L, "U", 3L),   // "update" of an absent key = upsert
      (5L, "e0", 555L, "U", 2L)   // late-arriving lower seq ignored
    ).toDF("id", "status", "cents", "op", "seq")
    val out = Cdc.applyChangelog(snap, ch, Seq("id"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(
      (1L, "a2", 110L),  // updated
      (3L, "c", 300L),   // untouched
      (4L, "d", 400L),   // inserted
      (5L, "e", 500L)))  // upserted, seq-3 row
  }

  test("applying the same changelog twice is idempotent") {
    val ch = Seq((1L, "a2", 110L, "U", 1L), (2L, "b", 0L, "D", 1L))
      .toDF("id", "status", "cents", "op", "seq")
    val once = Cdc.applyChangelog(snap, ch, Seq("id"), "seq", "op")
    val twice = Cdc.applyChangelog(once, ch, Seq("id"), "seq", "op")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("maintainCountSum equals recomputation over applyChangelog's output") {
    val ch = Seq(
      (1L, "a", 110L, "U", 1L),   // update within group a
      (2L, "b", 0L, "D", 1L),     // delete the only b row → group vanishes
      (4L, "c", 400L, "I", 1L),   // insert into existing group c
      (5L, "z", 500L, "I", 1L)    // insert creating a NEW group
    ).toDF("id", "status", "cents", "op", "seq")
    val oldAgg = snap.groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum("cents").as("total"))
    val incr = graft.cdc.Cdc.maintainCountSum(oldAgg, snap, ch,
      Seq("id"), "status", "cents", "seq", "op")
    val recomputed = graft.cdc.Cdc.applyChangelog(snap, ch, Seq("id"), "seq", "op")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum("cents").as("total"))
    val a = incr.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = recomputed.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
    assert(!a.exists(_._1 == "b"), "deleted-out group must disappear")
    assert(a.exists(_._1 == "z"), "inserted group must appear")
  }

  test("maintainCountSum: NULL group keys merge null-safely") {
    val snapN = Seq((1L, Option.empty[String], 100L), (2L, Option("b"), 200L))
      .toDF("id", "status", "cents")
    val ch = Seq((1L, Option.empty[String], 0L, "D", 1L))
      .toDF("id", "status", "cents", "op", "seq")
    val oldAgg = snapN.groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("total"))
    val got = Cdc.maintainCountSum(oldAgg, snapN, ch, Seq("id"), "status", "cents", "seq", "op")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    // the NULL-status group's only row was deleted: with === the old row and
    // its delta would never meet and a stale (null, 1, 100) row would survive
    assert(got === Set((Some("b"), 1L, 200L)))
  }

  test("maintainCountSum plan: snapshot probed via broadcast, never shuffled for the minus join") {
    val q = SparkEntry.queries("q_incr_agg")(spark, "/root/testdata/sf0.001")
    graft.tools.PlanPin.withStaticPlans(spark) {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    }
  }

  test("plan: winner selection pushes a group limit below the shuffle; supersede is an anti-join") {
    val q = SparkEntry.queries("q_cdc_upsert")(spark, "/root/testdata/sf0.001")
    graft.tools.PlanPin.withStaticPlans(spark) {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"), plan.take(2000))
      assert(plan.contains("LeftAnti"), plan.take(2000))
      assert(!plan.contains("CartesianProduct"))
    }
  }
}
