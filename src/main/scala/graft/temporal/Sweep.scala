package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval density — how many intervals are active at each point
  * in time (concurrent sessions, open orders, in-flight spans), the classic
  * ops question the reference's per-sink counters answer only per-entity
  * (`/root/reference/source/stats/stats.go` keeps running totals, never a
  * time profile).
  *
  * The naive formulations both die at scale: exploding every interval to its
  * covered buckets replicates rows without bound (the exact hazard
  * [[TemporalJoin.rangeJoin]] guards with a cap), and a global
  * `sum() OVER (ORDER BY bucket)` window puts the ENTIRE series through one
  * partition — Spark plans an empty-partition window as a single task, the
  * canonical hidden serialization point.
  *
  * This is the sweep instead: each interval contributes exactly TWO delta
  * rows (+1 at its start bucket, −1 one past its end bucket) regardless of
  * length — a sentinel open-ended interval costs the same as a one-bucket
  * one — and the running sum over bucketed deltas is computed as a
  * TWO-LEVEL distributed prefix sum:
  *
  *   1. deltas are aggregated per bucket (map-side partial combine: the
  *      shuffle carries one row per distinct bucket per mapper, not one per
  *      interval end);
  *   2. buckets are grouped into fixed-size BLOCKS and each block computes
  *      its internal running sum under a block-partitioned window — parallel
  *      across blocks;
  *   3. per-block totals (one row per block) flow through the only global
  *      window in the plan — over #blocks rows, thousands where the naive
  *      plan serializes millions — yielding each block's starting offset,
  *      which a broadcast join adds back.
  *
  * Steps 2 and 3 both consume the per-bucket aggregate; the second reference
  * would re-run the delta shuffle from scratch (Catalyst re-evaluates shared
  * subtrees per consumer), so the bucket-level intermediate — already
  * compacted to one row per non-empty bucket, bounded by the time range, not
  * the data — is localCheckpointed once (the [[graft.dedup.Components]]
  * lifetime idiom: the ContextCleaner frees the blocks when the plans die).
  *
  * Output is the CHANGE-POINT step function: one row per bucket where any
  * interval boundary lands — (bucket_start, active), active = number of
  * intervals covering that bucket. Between emitted buckets the last value
  * holds; the trailing row is the 0 after the last interval ends. Bounds are
  * epoch-microsecond bigints, both ends inclusive, matching the
  * [[TemporalJoin]] conventions.
  */
object Sweep {

  /** Concurrent-interval counts over time for intervals `[startCol, endCol]`
    * (inclusive bigint bounds, e.g. epoch-us) at `bucketWidth` granularity.
    * Returns (bucket_start: bigint, active: bigint) at change points only,
    * ordered meaning only by `bucket_start`. Rows with a null bound or
    * end < start are dropped (malformed spans, the [[TemporalJoin]]
    * convention). `blockBuckets` sizes level 2: the global window sees
    * ceil(#non-empty-buckets / blockBuckets) rows. */
  def activeIntervals(spans: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, blockBuckets: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth out of range: $bucketWidth")
    require(blockBuckets > 0, s"blockBuckets out of range: $blockBuckets")
    // caller-supplied bound columns enter ONLY through the Column API; the
    // `div` arithmetic interpolates nothing but numbers over internal
    // __-aliases (a backtick-needing name can't break the parse, an
    // expression string can't be smuggled in — reachable from SQL via the
    // active_intervals TVF; same fix as Series.grid / commit ff6d2e6)
    val deltas = spans
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) >= col(startCol))
      .select(col(startCol).as("__s"), col(endCol).as("__e"))
      .select(explode(array(
        struct(expr(s"__s div ${bucketWidth}L").as("b"), lit(1L).as("d")),
        struct((expr(s"__e div ${bucketWidth}L") + 1L).as("b"),
          lit(-1L).as("d")))).as("__x"))
      .select(col("__x.b").as("__b"), col("__x.d").as("__d"))
    // level 1: one row per non-empty bucket (partial agg combines map-side)
    val perBucket = deltas.groupBy(col("__b")).agg(sum(col("__d")).as("__d"))
      .withColumn("__blk", expr(s"__b div ${blockBuckets}L"))
    // level 2: block-internal running sums, parallel across blocks; the
    // window's (blk) clustering is what the checkpoint must not lose, so
    // checkpoint AFTER it — offsets (level 3) and the final join both read
    // the materialized blocks instead of re-shuffling the deltas
    val withRun = perBucket
      .withColumn("__run", sum(col("__d")).over(
        Window.partitionBy(col("__blk")).orderBy(col("__b"))))
      .localCheckpoint()
    // level 3: block offsets — the ONE global window, over #blocks rows
    // (last __run of a block IS its total: the block window ends there)
    val offsets = withRun
      .groupBy(col("__blk")).agg(max_by(col("__run"), col("__b")).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.orderBy(col("__blk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__blk"), col("__off"))
    withRun.join(broadcast(offsets), "__blk")
      .select((col("__b") * bucketWidth).as("bucket_start"),
        (col("__run") + col("__off")).as("active"))
  }
}
