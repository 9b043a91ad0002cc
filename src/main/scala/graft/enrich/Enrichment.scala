package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Broadcast lookup enrichment stage.
  *
  * Attaches per-tool metadata from a small dimension table via a broadcast
  * hash join — the reference's analog is the name→connector map lookup
  * (reference broker/connector.go:108-114) plus the per-source YAML config
  * attached at enrich time (reference broker/connector.go:387).
  *
  * Scale: the dimension is O(10) rows; `broadcast()` pins a BroadcastHashJoin
  * so the 10^12-row fact side never shuffles for this join.
  */
object Enrichment {

  /** (tool, team, cost_class, redact). Covers every generated tool except
    * 'web' — the missing key exercises the left-join null path.
    * Mirrored EXACTLY by [[graft.Oracles.toolDimCte]]. */
  val toolDim: Seq[(String, String, String, Boolean)] = Seq(
    ("bash", "infra", "high", false),
    ("search", "retrieval", "medium", false),
    ("edit", "authoring", "low", true),
    ("none", "chat", "low", false)
  )

  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    toolDim.toDF("tool", "team", "cost_class", "redact")
  }

  /** Left join so unmatched tools survive with null metadata. */
  def enrich(turns: DataFrame, spark: SparkSession): DataFrame =
    turns.join(broadcast(dim(spark)), Seq("tool"), "left")
}
