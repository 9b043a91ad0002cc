package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.AsofFunctions.asof_index

/** Temporal joins Spark lacks as built-ins, composed from operators it has.
  *
  * - [[asofJoin]]: each probe row picks the latest build row at-or-before its
  *   timestamp (the "enrich with the config version that was active then"
  *   join; DuckDB spells it ASOF JOIN, kdb+ `aj`). Implemented as the
  *   union-merge: ONE shuffle on the key, one per-partition sort, a running
  *   `last(ignoreNulls)` window — no inequality join, no row multiplication,
  *   cost O((P+B) log(P+B)) per partition regardless of how many snapshots
  *   precede each probe.
  * - [[asofJoinBroadcast]]: the same semantics when the build side is SMALL
  *   (config/dimension history): per-key sorted snapshot arrays are built
  *   once, broadcast, and each probe row binary-searches them via the
  *   codegen [[graft.functions.AsofIndex]] kernel — zero shuffle on the
  *   probe side, O(log S) per row, immune to probe-key skew (a hot key costs
  *   nothing extra because nothing shuffles).
  * - [[rangeJoin]]: points⋈intervals containment join, binned: both sides
  *   are keyed by fixed-width time buckets so the inequality join becomes an
  *   equi-join on (keys, bucket) + an exact filter — a shuffle hash/merge
  *   join instead of the broadcast-nested-loop Spark plans for a raw
  *   inequality condition. The bucket key also SPREADS key skew: a hot key's
  *   rows land across its time buckets instead of one reducer.
  *
  * Timestamps are epoch-microsecond bigints (the engine's cross-engine
  * convention — raw timestamps never enter compared output). Both sides'
  * non-key column names must be disjoint.
  */
object TemporalJoin {

  private def snapStruct(build: DataFrame, keys: Seq[String], buildTs: String) = {
    val vals = build.columns.filterNot(c => keys.contains(c) || c == buildTs).toSeq
    require(vals.nonEmpty,
      "as-of build side needs at least one value column beyond keys + timestamp")
    (vals, struct(vals.map(col): _*))
  }

  /** Left as-of join: all probe columns, plus the build side's non-key
    * non-ts columns from the latest build row with `buildTs` <= `probeTs`
    * on equal `keys` (null when no build row qualifies). A build row AT the
    * probe timestamp matches ("at or before"). If several build rows share
    * (key, ts), which one wins is unspecified — keep build timestamps
    * unique per key. `maxStaleness` (same unit as the timestamps) bounds
    * the lookback — a match older than `probeTs - maxStaleness` enriches
    * as null, the kdb `aj` window / temporal-join TTL semantics. Filter the
    * result on a build column IS NOT NULL for inner-as-of semantics. */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTs: String, buildTs: String,
      maxStaleness: Option[Long] = None): DataFrame = {
    val probeOnly = probe.columns.filterNot(keys.contains).toSeq
    val (vals, snap) = snapStruct(build, keys, buildTs)
    // the matched snapshot's own timestamp rides inside the carried struct
    // so the staleness bound can be applied after the running last()
    val carried = struct(col(buildTs).as("__bts"), snap.as("__v"))
    val carriedType = StructType(Seq(
      build.schema(buildTs).copy(name = "__bts"),
      org.apache.spark.sql.types.StructField("__v", StructType(vals.map(build.schema(_))))))

    val p = probe.select(
      keys.map(col) ++
        Seq(col(probeTs).as("__ts"), lit(1).as("__side")) ++
        probeOnly.map(col) :+
        lit(null).cast(carriedType).as("__snap"): _*)
    val b = build.select(
      keys.map(col) ++
        Seq(col(buildTs).as("__ts"), lit(0).as("__side")) ++
        probeOnly.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) :+
        carried.as("__snap"): _*)

    // build rows sort before probe rows at equal __ts (side 0 < 1), so a
    // snapshot taken exactly at the probe instant is visible to it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val fresh = maxStaleness
      .map(s => col("__snap.__bts") >= col("__ts") - s)
      .getOrElse(lit(true))
    p.unionByName(b)
      .withColumn("__snap", last(col("__snap"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("__snap", when(fresh, col("__snap")))
      .select(probe.columns.map(col).toSeq ++
        vals.map(v => col(s"__snap.__v.$v").as(v)): _*)
  }

  /** [[asofJoin]] semantics with a BROADCAST build side: build collapses to
    * one row per key holding its snapshots sorted by timestamp (ties broken
    * by the value struct, so the array is deterministic), the probe
    * broadcast-joins that, and `asof_index` binary-searches the timestamp
    * array in generated code. The right plan whenever the build side is a
    * config/dimension history that fits an executor — the probe side never
    * shuffles. */
  def asofJoinBroadcast(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTs: String, buildTs: String,
      maxStaleness: Option[Long] = None): DataFrame = {
    val (vals, snap) = snapStruct(build, keys, buildTs)
    val perKey = build
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(col(buildTs).as("ts"), snap.as("v")))).as("__snaps"))
    probe
      .join(broadcast(perKey), keys, "left")
      // try_element_at, NOT element_at: asof_index is null-INTRODUCING
      // (non-null inputs, null output when no snapshot qualifies), and ANSI
      // element_at's static nullability ignores the ordinal's nullability
      // (GetArrayItemUtil.computeNullabilityFromArray's failOnError branch) —
      // over a non-nullable array the whole expression is marked non-null,
      // codegen elides the index null check, and the uninitialized int slot
      // (-1) silently selects the LAST element. try_element_at takes the
      // always-nullable path; the index is valid-or-null, so semantics are
      // unchanged. Regression-tested in TemporalJoinSpec ("inner-as-of
      // filter...").
      .withColumn("__i", asof_index(col("__snaps.ts"), col(probeTs)))
      // staleness bound: the matched snapshot's own timestamp (parallel
      // array, same index) must be within the lookback window
      .withColumn("__i", maxStaleness match {
        case Some(s) => when(
          try_element_at(col("__snaps.ts"), col("__i")) >= col(probeTs) - s, col("__i"))
        case None => col("__i")
      })
      .withColumn("__v", try_element_at(col("__snaps.v"), col("__i")))
      .select(probe.columns.map(col).toSeq ++ vals.map(v => col(s"__v.$v").as(v)): _*)
  }

  /** Inner containment join: point rows paired with every interval row of
    * equal `keys` whose [startTs, endTs] (inclusive both ends) contains
    * `pointTs`. Each interval is exploded to the fixed-width buckets it
    * covers (replication factor len/bucketWidth + 1 — pick bucketWidth near
    * the typical interval length, the bin-size rule of the binned-range-join
    * literature), each point computes its single bucket, and the join runs
    * on (keys, bucket) with the exact containment filter after. Each
    * qualifying (point, interval) pair appears exactly once: a point has one
    * bucket and an interval covers it at most once — no dedup pass.
    * Intervals with endTs < startTs produce nothing. Timestamps must be
    * non-negative (`div` truncation = floor).
    *
    * `maxBucketsPerInterval` is the replication circuit-breaker: ONE
    * pathological interval (an open-ended 9999-12-31 sentinel — a data bug,
    * not a workload) would otherwise ask `sequence()` for millions of bucket
    * rows and kill the task on Spark's array-length ceiling mid-job. An
    * interval covering more buckets than the cap fails the job FAST with an
    * error naming the offending key and bounds — in the task, before any
    * array is materialized — so the fix (clean the row, or widen
    * bucketWidth toward the typical interval length) is one grep away. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTs: String, startTs: String, endTs: String, bucketWidth: Long,
      maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth out of range: $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval out of range: $maxBucketsPerInterval")
    val pts = points.withColumn("__bkt", expr(s"$pointTs div ${bucketWidth}L"))
    val ivs = intervals
      .filter(col(endTs) >= col(startTs))
      .withColumn("__bkt", explode(guardedBuckets("rangeJoin",
        keys, startTs, endTs, bucketWidth, maxBucketsPerInterval)))
    pts.join(ivs, (keys :+ "__bkt").toSeq)
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__bkt")
  }

  /** Inner interval-overlap join — the third standard temporal shape after
    * as-of and point⋈interval: left interval rows paired with every right
    * interval row of equal `keys` whose [rStart, rEnd] overlaps their
    * [lStart, lEnd] (closed intervals; touching endpoints DO overlap).
    * Session⋈outage, span⋈span.
    *
    * Same binning trick as [[rangeJoin]], applied to BOTH sides: each side
    * explodes to the fixed-width buckets it covers, the inequality join
    * becomes an equi-join on (keys, bucket) + the exact overlap filter —
    * shuffle hash/merge strategy instead of the broadcast-nested-loop plan a
    * raw inequality condition gets, and the bucket key spreads hot-key skew
    * across time. An overlapping pair is covered by EVERY bucket their
    * overlap region spans — it is emitted exactly once via the
    * first-overlap-bucket trick: only the bucket of max(lStart, rStart)
    * (= max of the two start buckets, div being monotone) produces the pair;
    * that bucket lies in both intervals whenever they overlap, so no
    * qualifying pair is lost and no dedup pass runs. Degenerate intervals
    * (end < start) on either side produce nothing. Timestamps must be
    * non-negative. Both sides' non-key column names must be disjoint;
    * `maxBucketsPerInterval` guards each side's replication exactly as in
    * [[rangeJoin]]. */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth out of range: $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval out of range: $maxBucketsPerInterval")
    def explodeSide(df: DataFrame, start: String, end: String) = df
      .filter(col(end) >= col(start))
      .withColumn("__bkt", explode(guardedBuckets("overlapJoin",
        keys, start, end, bucketWidth, maxBucketsPerInterval)))
    explodeSide(left, lStart, lEnd)
      .join(explodeSide(right, rStart, rEnd), (keys :+ "__bkt").toSeq)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // first-overlap-bucket: emit in the bucket of max(lStart, rStart) only
      .filter(col("__bkt") === greatest(
        expr(s"$lStart div ${bucketWidth}L"), expr(s"$rStart div ${bucketWidth}L")))
      .drop("__bkt")
  }

  /** The covered-bucket array of [startTs, endTs] at `bucketWidth`, or a
    * fast in-task failure naming the row when it would exceed `cap` buckets
    * (the count is checked with integer arithmetic BEFORE `sequence()`
    * materializes anything). */
  private def guardedBuckets(op: String, keys: Seq[String], startTs: String,
      endTs: String, bucketWidth: Long, cap: Long): Column = {
    val lo = expr(s"$startTs div ${bucketWidth}L")
    val hi = expr(s"$endTs div ${bucketWidth}L")
    val msg = concat(
      lit(s"$op: interval covers more than $cap buckets of width " +
        s"$bucketWidth (key="),
      concat_ws(",", keys.map(k => col(k).cast("string")): _*),
      lit(s", $startTs="), col(startTs).cast("string"),
      lit(s", $endTs="), col(endTs).cast("string"),
      lit(") — clean the row or raise bucketWidth toward the typical interval length"))
    when(hi - lo < cap, sequence(lo, hi)).otherwise(raise_error(msg))
  }
}
