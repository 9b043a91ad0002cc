package graft

import graft.temporal.TemporalJoin
import graft.tools.PlanPin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics + plan-shape tests for the temporal join family. Parity tests
  * run both as-of implementations (union-window vs broadcast-binary-search)
  * against each other and the range join against its naive inequality-join
  * twin — the driver's DuckDB ASOF JOIN oracle is the third, independent
  * check. */
class TemporalJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  import spark.implicits._

  private def probe: DataFrame = Seq(
    ("a", 100L, 1L), ("a", 150L, 2L), ("a", 200L, 3L), ("a", 50L, 4L),
    ("b", 500L, 5L), ("c", 100L, 6L)
  ).toDF("k", "ts", "row_id")

  // snapshots: a@100, a@180; b@400; no c
  private def build: DataFrame = Seq(
    ("a", 100L, 10L), ("a", 180L, 18L), ("b", 400L, 40L)
  ).toDF("k", "snap_ts", "version")

  private def asofExpected = Map( // row_id -> version (None = unmatched)
    1L -> Some(10L), // snapshot AT the probe instant is visible
    2L -> Some(10L), // latest at-or-before, not the later one
    3L -> Some(18L),
    4L -> None,      // before the first snapshot
    5L -> Some(40L),
    6L -> None)      // key with no snapshots

  private def checkAsof(out: DataFrame): Unit = {
    val got = out.select("row_id", "version").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === asofExpected)
  }

  test("asofJoin: at-or-before semantics, ties, unmatched keys (union-window form)") {
    checkAsof(TemporalJoin.asofJoin(probe, build, Seq("k"), "ts", "snap_ts"))
  }

  test("asofJoinBroadcast: identical semantics via codegen binary search") {
    checkAsof(TemporalJoin.asofJoinBroadcast(probe, build, Seq("k"), "ts", "snap_ts"))
  }

  test("inner-as-of: isNotNull filter drops unmatched probes after inner-join conversion " +
      "(ANSI element_at nullability regression)") {
    // The filter converts the left join to inner, making every asof input
    // non-nullable — ANSI element_at then computed static nullable=false
    // (its nullability ignores a nullable ordinal), codegen elided the index
    // null check, and the unmatched probe silently took the LAST snapshot
    // (uninitialized ordinal -1). try_element_at in asofJoinBroadcast is the
    // fix; this pins it.
    val out = TemporalJoin.asofJoinBroadcast(probe, build, Seq("k"), "ts", "snap_ts")
      .filter(col("version").isNotNull)
    val got = out.select("row_id", "version").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === asofExpected.collect { case (k, Some(v)) => k -> v })
  }

  test("as-of staleness bound: matches older than the window enrich as null (both forms)") {
    // probe row_id 3 = ("a", 200); latest snapshot a@180 → gap 20
    def versionAt(ms: Option[Long]): Seq[Option[Long]] = Seq(
      TemporalJoin.asofJoin(probe, build, Seq("k"), "ts", "snap_ts", ms),
      TemporalJoin.asofJoinBroadcast(probe, build, Seq("k"), "ts", "snap_ts", ms))
      .map { df =>
        val r = df.filter(col("row_id") === 3L).select("version").head()
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
    assert(versionAt(Some(30L)) === Seq(Some(18L), Some(18L))) // 20 <= 30: fresh
    assert(versionAt(Some(20L)) === Seq(Some(18L), Some(18L))) // boundary inclusive
    assert(versionAt(Some(10L)) === Seq(None, None))           // 20 > 10: stale
    assert(versionAt(None) === Seq(Some(18L), Some(18L)))      // unbounded default
  }

  test("as-of implementations agree on real data (events vs derived snapshots)") {
    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), unix_micros(col("ts").cast("timestamp")).as("e_us"))
    val snaps = e
      .withColumn("bkt", expr("e_us div 21600000000L"))
      .filter(col("bkt") % 4 === length(col("event_type")) % 4)
      .select(col("event_type"), col("bkt").as("version"),
        (col("bkt") * 21600000000L).as("snap_us"))
      .distinct()
    val a = TemporalJoin.asofJoin(e, snaps, Seq("event_type"), "e_us", "snap_us")
      .groupBy("event_type", "version").count()
    val b = TemporalJoin.asofJoinBroadcast(e, snaps, Seq("event_type"), "e_us", "snap_us")
      .groupBy("event_type", "version").count()
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("asofJoinBroadcast plan: broadcast join + build-side agg only, no SMJ, no probe shuffle") {
    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), unix_micros(col("ts").cast("timestamp")).as("e_us"))
    val snaps = e.limit(50).withColumnRenamed("e_us", "snap_us").withColumn("version", lit(1L))
    val out = TemporalJoin.asofJoinBroadcast(e, snaps, Seq("event_type"), "e_us", "snap_us")
    PlanPin.withStaticPlans(spark) {
      val st = PlanPin.stats(out)
      assert(st.broadcastJoins === 1 && st.sortMergeJoins === 0 && st.cartesians === 0, st.toString)
      // every exchange belongs to the (small) build aggregation — the probe
      // lineage is scan → project → BHJ → project, shuffle-free
      assert(st.shuffleExchanges <= 2, st.toString)
    }
  }

  test("rangeJoin: inclusive bounds, multi-bucket intervals, exactly-once pairs, empty intervals dropped") {
    val pts = Seq(("a", 0L, 1L), ("a", 10L, 2L), ("a", 25L, 3L), ("a", 26L, 4L),
      ("b", 10L, 5L)).toDF("k", "ts", "pid")
    val ivs = Seq(
      ("a", 10L, 25L, 100L),  // spans buckets 1..2 at width 10
      ("a", 0L, 39L, 101L),   // spans buckets 0..3 — covers every a-point
      ("a", 30L, 20L, 102L),  // end < start: contributes nothing
      ("b", 11L, 12L, 103L)   // misses b@10
    ).toDF("k", "w_start", "w_end", "win_id")
    val got = TemporalJoin.rangeJoin(pts, ivs, Seq("k"), "ts", "w_start", "w_end", 10L)
      .select("pid", "win_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(
      (2L, 100L), (3L, 100L),             // inclusive both ends: ts=10 and ts=25 in [10,25]
      (1L, 101L), (2L, 101L), (3L, 101L), (4L, 101L)))
  }

  test("rangeJoin parity with the naive inequality join on real data") {
    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), unix_micros(col("ts").cast("timestamp")).as("e_us"))
    val wins = e
      .withColumn("bkt", expr("e_us div 21600000000L"))
      .filter(col("bkt") % 4 === length(col("event_type")) % 4)
      .select(col("event_type"), col("bkt").as("version"),
        (col("bkt") * 21600000000L).as("w_start"),
        (col("bkt") * 21600000000L + 5400000000L).as("w_end"))
      .distinct()
    val binned = TemporalJoin.rangeJoin(e, wins, Seq("event_type"),
        "e_us", "w_start", "w_end", 3600000000L)
      .groupBy("event_type", "version").count()
    val naive = e.join(wins.withColumnRenamed("event_type", "w_type"),
        col("event_type") === col("w_type") &&
          col("e_us") >= col("w_start") && col("e_us") <= col("w_end"))
      .groupBy("event_type", "version").count()
    assert(binned.count() > 0)
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("rangeJoin: a pathological interval fails fast naming the key, instead of " +
      "materializing millions of bucket rows (replication circuit-breaker)") {
    val pts = Seq(("a", 5L, 1L)).toDF("k", "ts", "pid")
    val hostile = Seq(
      ("a", 0L, 9L, 100L),                 // sane: 1 bucket at width 10
      ("a", 0L, 253402300799000000L, 666L) // 9999-12-31 sentinel end — a data bug
    ).toDF("k", "w_start", "w_end", "win_id")
    // USER_RAISED_EXCEPTION surfaces as SparkRuntimeException (raise_error),
    // possibly wrapped in a SparkException task failure — match the message
    // anywhere on the cause chain
    val e = intercept[Exception] {
      TemporalJoin.rangeJoin(pts, hostile, Seq("k"), "ts", "w_start", "w_end", 10L).count()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msg.contains("rangeJoin") && msg.contains("key=a") &&
      msg.contains("253402300799000000"), msg)
    // the documented remedy — bucketWidth raised toward the interval scale —
    // brings the same rows under the cap and the join runs clean
    val ok = TemporalJoin.rangeJoin(pts, hostile, Seq("k"), "ts", "w_start", "w_end",
      bucketWidth = 100000000000000L)
    assert(ok.select("win_id").collect().map(_.getLong(0)).toSet === Set(100L, 666L))
  }

  test("overlapJoin's circuit breaker names overlapJoin, not rangeJoin") {
    val l = Seq(("a", 0L, 253402300799000000L, 1L)).toDF("k", "l_start", "l_end", "lid")
    val r = Seq(("a", 5L, 9L, 2L)).toDF("k", "r_start", "r_end", "rid")
    val e = intercept[Exception] {
      TemporalJoin.overlapJoin(l, r, Seq("k"),
        "l_start", "l_end", "r_start", "r_end", bucketWidth = 10L).count()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msg.contains("overlapJoin") && !msg.contains("rangeJoin"),
      s"the breaker must point the user at the operator they actually called: $msg")
  }

  test("overlapJoin: closed-interval overlap, touching endpoints, exactly-once pairs, " +
      "degenerate intervals dropped") {
    val l = Seq(
      ("a", 0L, 25L, 1L),   // crosses buckets 0..2 at width 10
      ("a", 40L, 45L, 2L),
      ("a", 50L, 30L, 3L),  // degenerate: end < start
      ("b", 0L, 100L, 4L)
    ).toDF("k", "l_start", "l_end", "lid")
    val r = Seq(
      ("a", 20L, 60L, 100L), // overlaps lid 1 ([20,25]) and lid 2
      ("a", 25L, 25L, 101L), // touches lid 1 exactly at 25 — closed: overlap
      ("a", 26L, 39L, 102L), // gap between lid 1 and lid 2
      ("b", 200L, 300L, 103L), // disjoint from lid 4
      ("b", 90L, 80L, 104L)  // degenerate
    ).toDF("k", "r_start", "r_end", "rid")
    val got = TemporalJoin.overlapJoin(l, r, Seq("k"),
        "l_start", "l_end", "r_start", "r_end", bucketWidth = 10L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    // exactly-once: no pair may appear twice even when the overlap region
    // spans several buckets (lid 4 never matches; lid 1 × rid 100 overlap
    // [20,25] spans one bucket but both intervals span several)
    assert(got.length === got.toSet.size, s"duplicate pairs: ${got.mkString(",")}")
    assert(got.toSet === Set((1L, 100L), (1L, 101L), (2L, 100L)))
  }

  test("overlapJoin parity with the naive inequality join on real data") {
    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("e_us"))
    val spans = e.groupBy(col("event_type"), col("user_id"))
      .agg(min(col("e_us")).as("span_start"), max(col("e_us")).as("span_end"))
    val wins = e
      .withColumn("bkt", expr("e_us div 21600000000L"))
      .filter(col("bkt") % 4 === length(col("event_type")) % 4)
      .select(col("event_type"), col("bkt").as("version"),
        (col("bkt") * 21600000000L).as("w_start"),
        (col("bkt") * 21600000000L + 5400000000L).as("w_end"))
      .distinct()
    val binned = TemporalJoin.overlapJoin(spans, wins, Seq("event_type"),
        "span_start", "span_end", "w_start", "w_end", bucketWidth = 21600000000L)
      .groupBy("event_type", "version").count()
    val naive = spans.join(wins.withColumnRenamed("event_type", "w_type"),
        col("event_type") === col("w_type") &&
          col("span_start") <= col("w_end") && col("w_start") <= col("span_end"))
      .groupBy("event_type", "version").count()
    assert(binned.count() > 0)
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("overlapJoin plan: equi-join strategy, never nested-loop or cartesian") {
    val q = SparkEntry.queries("q_overlap_sessions")(spark, sfDir)
    PlanPin.withStaticPlans(spark) {
      val st = PlanPin.stats(q)
      assert(st.cartesians === 0 && st.nestedLoopJoins === 0, st.toString)
    }
  }

  test("rangeJoin plan: equi-join strategy, never nested-loop or cartesian") {
    val q = SparkEntry.queries("q_range_windows")(spark, sfDir)
    PlanPin.withStaticPlans(spark) {
      val st = PlanPin.stats(q)
      assert(st.cartesians === 0, st.toString)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    }
  }

  test("topOrdersPerSegment: k rows per segment, ranked by price then key; WindowGroupLimit in plan") {
    val out = graft.relational.Tpch.topOrdersPerSegment(spark, sfDir, k = 3)
    val rows = out.collect()
    val bySeg = rows.groupBy(_.getString(0))
    bySeg.foreach { case (seg, rs) =>
      assert(rs.length <= 3, s"$seg has ${rs.length} rows")
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to rs.length), seg)
      // price non-increasing with rank
      assert(sorted.map(_.getLong(2)).toSeq.reverse.sorted.reverse ===
        sorted.map(_.getLong(2)).toSeq, seg)
    }
    PlanPin.withStaticPlans(spark) {
      val plan = graft.relational.Tpch.topOrdersPerSegment(spark, sfDir, k = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"rank filter must push a group limit below the shuffle: ${plan.take(2000)}")
    }
  }

  test("pivot query: explicit values, zero-filled cells, hours complete") {
    val out = SparkEntry.queries("q_pivot_type_hours")(spark, sfDir).collect()
    assert(out.length <= 24 && out.nonEmpty)
    val total = out.map(r => (1 to 5).map(r.getLong(_)).sum).sum
    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(total === nEvents, "pivot cells must partition all events")
  }
}
