package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGries.misraGries

/** EXACT frequent items at bounded memory — the two-pass classic:
  *
  *   1. one scan folds the column into a Misra–Gries summary (O(k) state
  *      per partial, mergeable map-side — see [[graft.functions.MisraGries]]);
  *      every item with true count > n/k is GUARANTEED to be a candidate,
  *      and at most k−1 candidates exist;
  *   2. one candidate-only pass counts those ≤ k−1 items exactly (the
  *      filter pushes to the scan; the groupBy shuffles at most k−1
  *      distinct keys) and keeps items with `count·k > n` — integer-exact.
  *
  * Net: exact heavy hitters over 100 TB with two scans and a shuffle of
  * k−1 keys, where the naive exact answer shuffles EVERY distinct key.
  * The result is deterministic (the summary's candidate SET can vary with
  * partitioning, but it always contains every qualifying item, and the
  * exact-count filter prunes the rest) — so a plain GROUP BY ... HAVING
  * oracle hash-matches. */
object HeavyHitters {

  /** (item, n_occurrences) for every value of `column` occurring more than
    * n/k times (strictly), counted exactly. NULLs are not items. */
  def exactTop(df: DataFrame, column: String, k: Int): DataFrame = {
    require(k >= 2, s"k out of range: $k")
    val row = df.agg(count(col(column)).as("n"),
      misraGries(col(column), k).as("cand")).collect().head
    val n = row.getAs[Long]("n")
    val candidates = row.getAs[Map[String, Long]]("cand").keys.toSeq.sorted
    if (candidates.isEmpty) {
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("item",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_occurrences",
            org.apache.spark.sql.types.LongType, nullable = false))))
    } else {
      df.filter(col(column).isin(candidates: _*))
        .groupBy(col(column).as("item"))
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") * k > n)
    }
  }
}
