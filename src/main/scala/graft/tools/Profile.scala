package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Transcripts
import graft.pipeline.Pipeline

/** Stage-by-stage wall-clock profiler: runs each pipeline prefix at the given
  * parallelism and prints seconds — used to find non-scaling stages.
  * Usage: runMain graft.tools.Profile <cpus> <sfDir> <mult> */
object Profile {
  def main(args: Array[String]): Unit = {
    val Array(cpus, sfDir, mult) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // keep AQE skew handling but NOT partition coalescing: the sandbox's
      // tiny pre-amplification shuffles (~2 MB) coalesce to 1 partition and
      // serialize the downstream 64x-amplified work — a small-data artifact
      // that cannot occur at the real 10^12-row scale this job targets
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", graft.util.Env.localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.add(f"    stage ${si.stageId}%3d ${si.name.takeWhile(_ != ' ')}%-20s tasks=${si.numTasks}%4d wall=${ms / 1000.0}%6.2f s")
      }
    })
    def time(name: String)(f: => Any): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      stages.forEach(s => println(s))
    }
    val m = mult.toInt
    def turns = Transcripts.amplified(spark, sfDir, m)
    time("warmup")(turns.count())
    time("scan+derive")(turns.count())
    time("parse")(graft.parse.GrokParser.parse(turns).count())
    time("parse+salt")(Pipeline.parsedSalted(turns).count())
    time("..+enrich")(graft.enrich.Enrichment.enrich(
      Pipeline.parsedSalted(turns), spark).count())
    time("..+route+fanout")(graft.route.Router.fanOut(
      graft.enrich.Enrichment.enrich(Pipeline.parsedSalted(turns), spark)).count())
    time("..+limit")(Pipeline.route(turns, spark)._1.count())
    val out = java.nio.file.Files.createTempDirectory("graft-prof").toString
    time("..+write")(Pipeline.route(turns, spark)._1
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
      .write.mode("overwrite").partitionBy("sink").parquet(s"$out/sinks"))
    spark.stop()
  }
}
