package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model.Transcripts
import graft.pipeline.Pipeline

/** Dumps the formatted physical plan of the e2e routed pipeline. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (routed, _) = Pipeline.route(Transcripts.fromEvents(spark, sfDir), spark)
    val out = routed.select("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
    val plan = out.queryExecution.optimizedPlan.toString
    println("=== grok_extract occurrences in optimized plan: " +
      "grok_extract".r.findAllIn(plan).length)
    println(out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
