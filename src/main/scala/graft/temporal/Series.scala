package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series toolkit over irregular event streams — the metrics-side
  * siblings of the temporal joins: resampling an irregular series onto a
  * fixed grid with as-of fill-forward (downsampling for dashboards /
  * training windows), and monotone-counter increase with reset detection
  * (the Prometheus `increase()`/`rate()` primitive, reference-adjacent: a
  * log shipper's bucket counters are exactly such counters, see
  * `/root/reference/source/limiter/limiter.go`'s per-bucket tallies).
  *
  * Scale shapes: the grid is 2 agg rows per key exploded to slots (guarded
  * by `maxSlotsPerKey`, same circuit-breaker discipline as
  * [[TemporalJoin.rangeJoin]] — a sentinel timestamp fails fast naming the
  * key, it never materializes a billion slots); the fill is
  * [[TemporalJoin.asofJoin]]'s union form — ONE key shuffle regardless of
  * how many grid points land on one hot key; the counter increase is ONE
  * window per key partition. */
object Series {

  /** Dense per-key slot grid: one row per `stepUs`-wide slot from the key's
    * first observation (ceil) to its last (floor), as `grid_us` epoch-μs.
    * Keys active for less than one full slot produce no rows. Timestamps
    * must be NON-NEGATIVE — the ceil/floor slot arithmetic relies on `div`
    * truncation being floor division, which holds only for non-negative
    * operands (same contract as [[TemporalJoin.rangeJoin]]'s bucketing);
    * unlike there, a violation here would produce a silently wrong grid, so
    * a negative timestamp fails fast naming the key. */
  def grid(obs: DataFrame, keys: Seq[String], tsUsCol: String, stepUs: Long,
      maxSlotsPerKey: Long = 1L << 20): DataFrame = {
    require(stepUs > 0, s"stepUs out of range: $stepUs")
    require(maxSlotsPerKey > 0, s"maxSlotsPerKey out of range: $maxSlotsPerKey")
    def keyMsg(what: String) = concat(
      lit(s"Series.grid: $what (key="),
      concat_ws(",", keys.map(k => col(k).cast("string")): _*),
      lit(")"))
    // the caller-supplied ts column enters ONLY through the Column API
    // (col(tsUsCol)); the `div` arithmetic interpolates nothing but the
    // numeric stepUs over internal __-aliases — a column name needing
    // backticks can't break the parse and an expression string can't be
    // smuggled in (the expr-injection class commit ff6d2e6 fixed in
    // weightedSample; reachable from SQL via the fill_forward TVF)
    obs.groupBy(keys.map(col): _*)
      .agg(min(col(tsUsCol)).as("__min_ts"), max(col(tsUsCol)).as("__max_ts"))
      .withColumn("__lo", expr(s"(__min_ts + ${stepUs}L - 1L) div ${stepUs}L"))
      .withColumn("__hi", expr(s"__max_ts div ${stepUs}L"))
      .withColumn("__slots",
        when(col("__min_ts") < 0, raise_error(keyMsg(
          "negative timestamps break the ceil/floor slot arithmetic — shift the epoch"))
          .cast("array<long>"))
          .when(col("__hi") < col("__lo"), array().cast("array<long>"))
          .when(col("__hi") - col("__lo") < maxSlotsPerKey,
            sequence(col("__lo"), col("__hi")))
          .otherwise(raise_error(keyMsg(
            s"key spans more than $maxSlotsPerKey slots of $stepUs μs — " +
              "raise stepUs or clean the outlier timestamps")).cast("array<long>")))
      .select(keys.map(col) :+ explode(col("__slots")).as("__slot"): _*)
      .select(keys.map(col) :+ (col("__slot") * stepUs).as("grid_us"): _*)
  }

  /** Resample an irregular series onto the fixed grid, each grid point
    * carrying the latest observation at-or-before it (fill-forward). Output:
    * `keys`, `grid_us`, and every non-key/non-ts column of `obs` filled
    * as-of. By construction the grid starts at each key's first observation,
    * so every point has a fill.
    *
    * Duplicate (key, ts) observations: with `tieBreak` empty, which
    * duplicate's payload fills is PARTITION-ORDER-DEPENDENT (the same hazard
    * [[counterIncrease]]'s tieBreak addresses) — the unique-(key, ts)
    * precondition is on the caller. Pass the natural unique id columns as
    * `tieBreak` when timestamps can collide: per (key, ts) the row with the
    * GREATEST tieBreak tuple wins, deterministically under any reshuffle. */
  def fillForward(obs: DataFrame, keys: Seq[String], tsUsCol: String,
      stepUs: Long, maxSlotsPerKey: Long = 1L << 20,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val build = if (tieBreak.isEmpty) obs else {
      // one winner per (key, ts): greatest tieBreak tuple — dedup BEFORE the
      // as-of union so the fill's running last() never sees a tied pair
      val w = Window.partitionBy((keys :+ tsUsCol).map(col): _*)
        .orderBy(tieBreak.map(c => col(c).desc): _*)
      obs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    TemporalJoin.asofJoin(
      grid(obs, keys, tsUsCol, stepUs, maxSlotsPerKey),
      build, keys, probeTs = "grid_us", buildTs = tsUsCol)
  }

  /** Monotone-counter increase with reset detection: per consecutive sample
    * pair (ordered by `tsCol` within `keys`), the counter's growth — or,
    * when the counter went BACKWARD (a process restart reset it to zero),
    * the new value itself, crediting the post-reset climb and dropping
    * whatever growth the crash window lost (the Prometheus convention; an
    * under-count, never an over-count). The first sample of a key has no
    * interval: null. Adds `increase` to `df`.
    *
    * `tsCol` (plus `tieBreak`, in order) must TOTALLY order each key's
    * samples — with a tie, `lag` reads whichever neighbor the partition
    * sort happened to place first and `increase` becomes
    * nondeterministic. Pass the natural unique id as `tieBreak` when
    * timestamps can collide. */
  def counterIncrease(df: DataFrame, keys: Seq[String], tsCol: String,
      counterCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieBreak).map(col): _*)
    val prev = lag(col(counterCol), 1).over(w)
    df.withColumn("increase",
      when(prev.isNull, lit(null))
        .when(col(counterCol) >= prev, col(counterCol) - prev)
        .otherwise(col(counterCol)))
  }
}
