package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k — the "top N per segment/user/day" shape, as a rank
  * window + filter rather than a groupBy + sort-explode: Spark's
  * WindowGroupLimit rule (3.5+) pushes the `rank <= k` bound BELOW the
  * shuffle, so each map task forwards at most k rows per group it sees and
  * the sort after the exchange works on ~k·groups rows, not the full table —
  * the distributed partial top-k a hand-written aggregator would do, for
  * free from the declarative form (TemporalJoinSpec asserts the
  * WindowGroupLimit operator is present). Order columns must define a total
  * order (include a unique tiebreak) or ranks are nondeterministic. */
object TopK {

  def perGroup(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
      k: Int, rankName: String = "rank_in_group"): DataFrame = {
    require(k > 0, s"k out of range: $k")
    df.withColumn(rankName,
        row_number().over(Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)))
      .filter(col(rankName) <= k)
  }
}
