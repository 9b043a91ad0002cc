package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order state-transition matrix over per-key event sequences — the
  * clickstream/session-flow primitive ("after a view, how often does a
  * purchase follow?"), and the Markov-chain input for next-event models and
  * bot detection (a scraper's transition row is near-deterministic; a
  * human's is diffuse). Complements [[Funnel]]: the funnel counts ONE
  * declared path, the matrix measures every observed hop.
  *
  * Shuffle shape: one hash exchange on `keys` for the lag window, one on
  * (from, to) for the count — both map-side combinable; the per-from total
  * rides a window over the already-aggregated matrix rows (|states|² at
  * most, trivially small whatever the input size).
  *
  * Probabilities are integer milli-units (`n·1000 div rowTotal` — floor, so
  * a from-row's probabilities sum to ≤ 1000, never a float): exact under
  * reshuffles and oracle-hashable, same discipline as the rest of the repo.
  *
  * `orderCols` must totally order each key's rows (pass the natural unique
  * id as a tie-break — the [[graft.temporal.Series.counterIncrease]]
  * contract); NULL states drop their hops (a NULL is no observation, not a
  * state). Each key's first event has no predecessor and contributes
  * nothing. */
object Transitions {

  /** (from_state, to_state, n, p_milli) for every observed consecutive pair. */
  def matrix(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      stateCol: String): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols required")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__from", lag(col(stateCol), 1).over(w))
      .filter(col("__from").isNotNull && col(stateCol).isNotNull)
      .groupBy(col("__from").as("from_state"), col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot",
        sum(col("n")).over(Window.partitionBy(col("from_state"))))
      .withColumn("p_milli", expr("n * 1000L div __tot"))
      .drop("__tot")
  }
}
