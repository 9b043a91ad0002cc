package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.enrich.Enrichment
import graft.limit.{RateLimit, SinglePassLimit}
import graft.model.Transcripts
import graft.pipeline.Pipeline
import graft.route.Router

/** Phase-timing probe for the single-pass limiter write path (operational
  * tool, not part of the driver contract): stage-write / verdict-scan /
  * moves / read-back, each timed separately. */
object SpProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_BENCH_MULT", "64").toInt
    val salt = sys.env.getOrElse("SPARK_GRAFT_SALT", "2").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", graft.util.Env.localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.util.Env.scratchDir), "probe").toString
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    val warmT = Transcripts.amplified(spark, sfDir, 1)
    SinglePassLimit.writeLimited(
      Router.fanOut(Enrichment.enrich(Pipeline.parsedProjected(warmT), spark)),
      RateLimit.defaultRules(), s"$tmp/warm", salt)

    val turns = Transcripts.amplified(spark, sfDir, mult)
    val fanned = Router.fanOut(Enrichment.enrich(Pipeline.parsedProjected(turns), spark))
    val out = s"$tmp/out"
    timed("stage-write") {
      SinglePassLimit.staged(fanned, salt)
        .write.mode("overwrite").partitionBy("sink", "bkt").parquet(out)
    }
    val cells = timed("verdict-scan") {
      spark.read.parquet(out)
        .groupBy(col("sink"), col("bkt").cast("long").as("bkt"))
        .agg(sum(col("bytes")).as("bytes")).collect()
    }
    println(s"PROBE cells ${cells.length}")
    val nFiles = timed("list-files") {
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).filter(p =>
        p.getFileName.toString.endsWith(".parquet")).count()
    }
    println(s"PROBE files $nFiles")
    timed("count-back") {
      println("PROBE rows " + spark.read.parquet(out).count())
    }
    // plain write for comparison
    timed("plain-write") {
      SinglePassLimit.staged(fanned, salt).drop("bkt")
        .write.mode("overwrite").parquet(s"$tmp/plain")
    }
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
