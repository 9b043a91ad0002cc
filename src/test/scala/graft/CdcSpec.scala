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

  test("diffSnapshots: minimal I/U/D changelog; unchanged rows emit nothing; " +
      "null values never report phantom updates; round-trip law holds") {
    val oldSnap = Seq(
      (1L, Option("a"), 100L),  // unchanged
      (2L, Option("b"), 200L),  // value change → U
      (3L, Option.empty[String], 300L), // null value, unchanged → nothing
      (4L, Option("d"), 400L)   // missing from new → D
    ).toDF("id", "status", "cents")
    val newSnap = Seq(
      (1L, Option("a"), 100L),
      (2L, Option("b"), 250L),
      (3L, Option.empty[String], 300L),
      (5L, Option("e"), 500L)   // new key → I
    ).toDF("id", "status", "cents")
    val diff = Cdc.diffSnapshots(oldSnap, newSnap, Seq("id"))
    val got = diff.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getString(3))).toSet
    assert(got === Set(
      (2L, Some("b"), 250L, "U"),  // carries the NEW values
      (4L, Some("d"), 400L, "D"),  // carries the old values, key is what matters
      (5L, Some("e"), 500L, "I")))
    // round-trip law: applying the diff replays old into new exactly
    val replayed = Cdc.applyChangelog(oldSnap, diff, Seq("id"), "seq", "op")
    assert(replayed.exceptAll(newSnap).isEmpty && newSnap.exceptAll(replayed).isEmpty)
  }

  test("diffSnapshots round-trip on real data reproduces the changelog's effect") {
    val sfDir = "/root/testdata/sf0.001"
    val snap = SparkEntry.queries("q_cdc_upsert")(spark, sfDir) // next snapshot
    val oldSnap = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"),
        org.apache.spark.sql.functions.floor(col("o_totalprice") * 100)
          .cast("bigint").as("price_cents"))
    val diff = Cdc.diffSnapshots(oldSnap, snap, Seq("o_orderkey"))
    val replayed = Cdc.applyChangelog(oldSnap, diff, Seq("o_orderkey"), "seq", "op")
    assert(replayed.exceptAll(snap).isEmpty && snap.exceptAll(replayed).isEmpty)
    assert(diff.count() > 0)
  }

  test("maintainAggs: count + several sums maintained in one pass equal recomputation; " +
      "avg derivable from the maintained pair") {
    val snap2 = Seq(
      (1L, "a", 100L, 3L), (2L, "b", 200L, 5L), (3L, "a", 300L, 7L)
    ).toDF("id", "status", "cents", "units")
    val ch = Seq(
      (1L, "a", 150L, 4L, "U", 1L),  // update both measures in group a
      (2L, "b", 0L, 0L, "D", 1L),    // group b vanishes
      (4L, "z", 500L, 9L, "I", 1L)   // new group z
    ).toDF("id", "status", "cents", "units", "op", "seq")
    val oldAgg = snap2.groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("cents_sum"),
        sum("units").as("units_sum"))
    val incr = Cdc.maintainAggs(oldAgg, snap2, ch, Seq("id"), "status",
      Seq("cents" -> "cents_sum", "units" -> "units_sum"), "seq", "op")
    val recomputed = Cdc.applyChangelog(snap2, ch, Seq("id"), "seq", "op")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"), sum("cents").as("cents_sum"),
        sum("units").as("units_sum"))
    def set(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(set(incr) === set(recomputed))
    assert(set(incr) === Set(("a", 2L, 450L, 11L), ("z", 1L, 500L, 9L)))
    // avg derives exactly from the maintained (count, sum) pair
    val avg = incr.withColumn("avg_cents",
        org.apache.spark.sql.functions.expr("cents_sum div n_rows"))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(avg === Map("a" -> 225L, "z" -> 500L))
  }

  test("maintainCountSum plan: snapshot probed via broadcast, never shuffled for the minus join") {
    val q = SparkEntry.queries("q_incr_agg")(spark, "/root/testdata/sf0.001")
    graft.tools.PlanPin.withStaticPlans(spark) {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    }
  }

  test("streaming MERGE sink: versioned snapshots, kill/restart parity, replay idempotence, time travel") {
    import graft.cdc.CdcStream
    val base = java.nio.file.Files.createTempDirectory("graft-cdcs")
    val srcDir = base.resolve("src").toString
    val root = base.resolve("table").toString
    val ckpt = base.resolve("ckpt").toString
    // two changelog files = two micro-batches at maxFilesPerTrigger=1; the
    // single part file of each write is lifted into srcDir with a forced
    // mtime so the file source orders them deterministically
    val b0 = Seq((1L, "a", 100L, "I", 1L), (2L, "b", 200L, "I", 2L))
    val b1 = Seq((1L, "a2", 110L, "U", 1L), (2L, "b", 0L, "D", 2L), (3L, "c", 300L, "I", 3L))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    Seq(b0, b1).zipWithIndex.foreach { case (rows, i) =>
      val tmp = base.resolve(s"w$i").toString
      rows.toDF("id", "status", "cents", "op", "seq").coalesce(1).write.parquet(tmp)
      val part = graft.util.Fs.listDir(java.nio.file.Paths.get(tmp))
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(srcDir, s"b$i.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(s"$srcDir/b0.parquet").schema
    def drain(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = CdcStream.writer(stream, root, ckpt, Seq("id"), "seq", "op").start()
      q.awaitTermination()
    }
    drain()
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val after = rows(CdcStream.latest(spark, root).get)
    assert(after === Set((1L, "a2", 110L), (3L, "c", 300L)))
    // time travel to the first version: both inserts, no later changes
    assert(rows(CdcStream.version(spark, root, 0L)) === Set((1L, "a", 100L), (2L, "b", 200L)))
    // restart on the same checkpoint: nothing new to do, state unchanged
    drain()
    assert(rows(CdcStream.latest(spark, root).get) === after)
    // direct replay of a committed batch id: short-circuits, state unchanged
    CdcStream.applyBatch(root, Seq("id"), "seq", "op")(
      b1.toDF("id", "status", "cents", "op", "seq"), 1L)
    assert(rows(CdcStream.latest(spark, root).get) === after)
    // vacuum: drops the oldest version, keeps (and never touches) the latest
    assert(CdcStream.vacuum(root, keepLast = 1) === Seq(0L))
    assert(rows(CdcStream.latest(spark, root).get) === after)
    intercept[Exception] { CdcStream.version(spark, root, 0L).collect() }
    assert(CdcStream.vacuum(root, keepLast = 1) === Seq.empty)
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
