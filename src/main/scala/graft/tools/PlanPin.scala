package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-plan fingerprinting for the headline queries.
  *
  * [[PlanPin.stats]] reduces an executed plan to the counts that encode its
  * scale story — shuffle exchanges, broadcast joins, sort-merge joins,
  * cartesian products — and `PlanPinSpec` pins those counts per headline
  * query, so a "first plan that worked" regression (a dropped broadcast, an
  * extra exchange, a join flipping to cartesian) fails CI instead of only
  * surfacing as a bench delta next round.
  *
  * Run `graft.tools.PlanPin <sfDir>` to print the current table when a plan
  * changes INTENTIONALLY; paste the new row into PlanPinSpec with a note.
  * AQE is disabled for the snapshot: an AQE plan before its first action is
  * an unfinalized shell, and static shape is what's being pinned. */
object PlanPin {

  final case class PlanStats(
      shuffleExchanges: Int,
      broadcastJoins: Int,
      sortMergeJoins: Int,
      cartesians: Int,
      nestedLoopJoins: Int = 0) {
    override def toString: String =
      s"PlanStats(shuffleExchanges = $shuffleExchanges, broadcastJoins = $broadcastJoins, " +
        s"sortMergeJoins = $sortMergeJoins, cartesians = $cartesians" +
        (if (nestedLoopJoins != 0) s", nestedLoopJoins = $nestedLoopJoins" else "") + ")"
  }

  private def countOf(plan: String, pattern: String): Int =
    pattern.r.findAllIn(plan).length

  def stats(df: DataFrame): PlanStats = {
    val plan = df.queryExecution.executedPlan.toString
    PlanStats(
      shuffleExchanges = countOf(plan,
        "Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)"),
      // BNLJ counted SEPARATELY: an equi-join degrading to a nested-loop
      // join is exactly the regression class the pin exists to catch — in
      // one bucket with BHJ the fingerprint would not change
      broadcastJoins = countOf(plan, "BroadcastHashJoin"),
      sortMergeJoins = countOf(plan, "SortMergeJoin"),
      cartesians = countOf(plan, "CartesianProduct"),
      nestedLoopJoins = countOf(plan, "BroadcastNestedLoopJoin"))
  }

  /** The headline queries whose shapes are pinned (Bench's set). */
  val pinned: Seq[String] = Seq(
    "q_routed_rows", "q_sink_agg", "q_conv_spans", "q_enrich_agg",
    "q_limit_final", "q_dedup_exact", "q_minhash_pairs", "q_simhash",
    "q_ann_lsh", "q_token_stats", "q_quality", "q_langid",
    "q_curation_full", "q_tpch_revenue", "q_tpch_nation_volume",
    "q_tpch_bucketed_revenue", "q_asof_config", "q_cdc_upsert", "q_funnel",
    "q_overlap_sessions", "q_interval_density", "q_skipping_read",
    "q_dpp_hot_months", "q_anomaly", "q_bm25", "q_pagerank")

  def withStaticPlans[A](spark: SparkSession)(body: => A): A = {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-planpin")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${graft.util.Env.scratchDir}/graft-test-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    withStaticPlans(spark) {
      pinned.foreach { name =>
        val st = stats(graft.SparkEntry.queries(name)(spark, sfDir))
        println(f"""    "$name" -> $st,""")
      }
    }
    spark.stop()
  }
}
