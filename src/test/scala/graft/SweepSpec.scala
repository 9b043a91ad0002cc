package graft

import graft.temporal.Sweep
import graft.tools.PlanPin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics + decomposition + plan-shape tests for the sweep-line interval
  * density operator. The parity test is the load-bearing one: the two-level
  * distributed prefix sum must equal the naive explode-every-covered-bucket
  * count at every change point, for any block size — including blockBuckets
  * = 1 (every bucket its own block, the offsets window does all the work)
  * and a block size larger than the whole series (the offsets window
  * degenerates to a single row). The driver's DuckDB oracle
  * (q_interval_density) is the third, independent check: a serial global
  * running sum. */
class SweepSpec extends SparkSpec {

  import spark.implicits._

  // intervals chosen so density rises, plateaus, dips to zero mid-series,
  // and resumes: change points and a gap bucket both exercised; width 10
  private def spans: DataFrame = Seq(
    (0L, 29L),   // buckets 0-2
    (5L, 19L),   // buckets 0-1
    (10L, 39L),  // buckets 1-3
    (35L, 35L),  // point interval, bucket 3
    (80L, 99L)   // buckets 8-9 after a 4-7 gap
  ).toDF("s", "e")

  private def densityMap(out: DataFrame): Map[Long, Long] =
    out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("activeIntervals: change-point step function, gap and trailing zero") {
    val got = densityMap(Sweep.activeIntervals(spans, "s", "e", 10L, 4))
    // bucket 0: spans 1+2; 1: +span3 = 3; 2: span2 ended = 2; 3: span1
    // ended, span4 starts = 2; 4: all ended = 0 (gap holds); 8: span5 = 1;
    // 10: trailing zero
    assert(got === Map(0L -> 2L, 10L -> 3L, 20L -> 2L, 30L -> 2L,
      40L -> 0L, 80L -> 1L, 100L -> 0L))
  }

  test("activeIntervals: backtick-needing bound column names are handled") {
    // regression pin for the expr-injection class (same fix as Series.grid):
    // bound columns enter via the Column API only, so names with spaces or
    // dashes work — previously the interpolated `div` expr failed to parse
    val odd = spans.withColumnRenamed("s", "start ts").withColumnRenamed("e", "end-ts")
    val got = densityMap(Sweep.activeIntervals(odd, "start ts", "end-ts", 10L, 4))
    assert(got === densityMap(Sweep.activeIntervals(spans, "s", "e", 10L, 4)))
  }

  test("activeIntervals: malformed and null-bounded spans are dropped") {
    val dirty = spans.union(Seq((50L, 40L)).toDF("s", "e"))
      .union(Seq((Option.empty[Long], Option(60L)),
        (Option(60L), Option.empty[Long])).toDF("s", "e"))
    assert(densityMap(Sweep.activeIntervals(dirty, "s", "e", 10L, 4)) ===
      densityMap(Sweep.activeIntervals(spans, "s", "e", 10L, 4)))
  }

  test("activeIntervals: empty input yields empty output") {
    assert(Sweep.activeIntervals(spans.filter(lit(false)), "s", "e", 10L).isEmpty)
  }

  test("parity with the naive explode-every-covered-bucket count, any block size") {
    // pseudo-random spans over a few hundred buckets, deterministic seed
    val n = 500
    val rows = (0 until n).map { i =>
      val s = (i * 2654435761L) % 3000
      (s, s + (i * 40503L) % 700)
    }
    val df = rows.toDF("s", "e")
    val naive = df
      .select(explode(sequence(expr("s div 10L"), expr("e div 10L"))).as("bkt"))
      .groupBy((col("bkt") * 10L).as("bucket_start"))
      .agg(count(lit(1)).as("active"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (blockBuckets <- Seq(1, 7, 64, 100000)) {
      val got = densityMap(Sweep.activeIntervals(df, "s", "e", 10L, blockBuckets))
      // every change point the sweep emits must carry the naive count
      // (buckets absent from the naive map saw every interval end: 0)
      got.foreach { case (b, a) =>
        assert(a === naive.getOrElse(b, 0L), s"bucket $b (block=$blockBuckets)")
      }
      // and every density CHANGE in the naive series must be a change point
      val naiveSorted = naive.toSeq.sortBy(_._1)
      naiveSorted.zip((-10L, 0L) +: naiveSorted).foreach {
        case ((b, a), (pb, pa)) =>
          if (a != pa || pb != b - 10L) assert(got.contains(b), s"missing change at $b")
      }
    }
  }

  test("an open-ended sentinel interval costs two delta rows, not an explosion") {
    // the exact row that kills the explode formulation (rangeJoin guards it
    // with a cap): end = year-9999 epoch-us; the sweep emits 2 deltas and
    // completes instantly
    val sentinel = Seq((0L, 253402300799000000L)).toDF("s", "e")
    val got = densityMap(Sweep.activeIntervals(sentinel, "s", "e", 3600000000L, 64))
    assert(got(0L) === 1L && got.values.sum === 1L && got.size === 2)
  }

  test("plan: one broadcast join, no SMJ/cartesian, global window only over block totals") {
    PlanPin.withStaticPlans(spark) {
      val df = Sweep.activeIntervals(spans, "s", "e", 10L, 4)
      val stats = PlanPin.stats(df)
      assert(stats.broadcastJoins === 1 && stats.sortMergeJoins === 0 &&
        stats.cartesians === 0, stats.toString)
      // the single-partition exchange (the serial section) feeds the
      // block-offsets window, never the per-bucket data: it must sit above
      // an aggregate on __blk
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SinglePartition"))
      assert(!plan.contains("CartesianProduct"))
    }
  }
}
