package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust rolling anomaly detection over per-key series — the alerting half
  * of the metrics toolkit ([[Series]] builds the series, this flags its
  * outliers). The reference's limiter alerts on FIXED thresholds
  * (`/root/reference/source/limiter/limiter.go`: bucket count vs configured
  * cap); a fleet-wide pipeline can't hand-tune a cap per (entity, sink), so
  * the scale-out form is SELF-BASELINING: each point is judged against its
  * own key's trailing window.
  *
  * Median/MAD, not mean/stddev, on purpose: a volume spike inflates a
  * trailing stddev so much it masks the NEXT spike (and the spike itself
  * drags the mean); the median/MAD baseline has a 50 % breakdown point, so
  * yesterday's incident doesn't blind today's detector.
  *
  * Integer-exact by construction — no doubles anywhere: over an integral
  * `valueCol` the flag compares `2·dev2 > k·mad4` where `med2` = sum of the
  * two middle window values (2× median), `dev2` = |2·x − med2| (2×
  * deviation), `mad4` = sum of the two middle deviations (4× MAD). Exact
  * integer arithmetic is what lets a DuckDB oracle hash-match and keeps the
  * operator deterministic under partition reshuffles.
  *
  * Scale shape: ONE window per key partition (a hash shuffle on `keys`,
  * nothing else); the per-row cost is sorting the W-element trailing window
  * (W ≤ 4096 enforced — baselines are hours/days, not unbounded history).
  * The window array stays in the row, never in driver memory.
  *
  * Degenerate baseline: a constant window has MAD = 0, and ANY deviation
  * flags (`2·dev2 > 0`) — the right call for counters that flatline and then
  * move. Warm-up rows (< `window` preceding samples) keep their data columns
  * but carry NULL med2/dev2/mad4/anomaly: not enough history to judge.
  *
  * NULL values are excluded from baselines (`collect_list` drops them) and a
  * NULL current value yields NULL dev2/anomaly. `orderCols` must totally
  * order each key's rows (same contract as [[Series.counterIncrease]]) or
  * the trailing window is nondeterministic under ties.
  */
object Anomaly {

  /** Adds `med2`, `dev2`, `mad4`, `anomaly` (1/0/NULL int) to `df`, judging
    * `valueCol` against the `window` STRICTLY PRECEDING samples per key (the
    * point under test never contaminates its own baseline) at threshold
    * `|x − median| > k·MAD`. */
  def madFlags(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      valueCol: String, window: Int, k: Int): DataFrame = {
    require(window >= 4 && window <= 4096, s"window out of range: $window")
    require(k >= 1, s"k out of range: $k")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-window, -1)
    // 1-based positions of the two middle elements (equal when W is odd)
    val loMid = (window - 1) / 2 + 1
    val hiMid = window / 2 + 1
    def middleSum(arr: Column): Column =
      element_at(arr, loMid) + element_at(arr, hiMid)
    val v = col(valueCol)
    df.withColumn("__win", sort_array(collect_list(v).over(w)))
      // every element_at is guarded: ANSI mode throws on out-of-bounds
      // indexes, and warm-up windows are shorter than `window`
      .withColumn("med2",
        when(size(col("__win")) === window, middleSum(col("__win"))))
      .withColumn("dev2", abs(v * 2 - col("med2")))
      .withColumn("__devs", when(col("med2").isNotNull,
        sort_array(transform(col("__win"), x => abs(x * 2 - col("med2"))))))
      .withColumn("mad4",
        when(col("__devs").isNotNull, middleSum(col("__devs"))))
      .withColumn("anomaly", when(col("mad4").isNotNull && col("dev2").isNotNull,
        (col("dev2") * 2 > col("mad4") * k).cast("int")))
      .drop("__win", "__devs")
  }
}
