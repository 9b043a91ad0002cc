package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainCuration {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.text.Curation.run(
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet"),
      graft.text.Curation.Config(maxTokens = 256))
    val plan = out.queryExecution.executedPlan.toString
    println("EXCHANGES=" + "Exchange".r.findAllIn(plan).length)
    println("WINDOWS=" + "Window".r.findAllIn(plan).length)
    println("SMJ=" + "SortMergeJoin".r.findAllIn(plan).length)
    println("BHJ=" + "BroadcastHashJoin".r.findAllIn(plan).length)
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join("))
      .foreach(l => println(l.take(160)))
    spark.stop()
  }
}
