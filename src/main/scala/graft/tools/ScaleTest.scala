package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleTest {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(0, 50000000, 1, cpus.toInt * 2)
    df.select(xxhash64(col("id").cast("string")).as("h")).selectExpr("max(h)").collect()
    val t0 = System.nanoTime()
    df.select(xxhash64(concat(col("id").cast("string"), lit("x"))).as("h")).selectExpr("max(h)").collect()
    println(f"SCALETEST cpus=$cpus hash_sec=${(System.nanoTime()-t0)/1e9}%.2f")
    val txt = df.select(concat(lit("[INFO] tool=bash dur="), (col("id") % 1000).cast("string"), lit("ms status=ok payload-"), col("id").cast("string")).as("text"))
    txt.filter(col("text").rlike("tool=bash")).selectExpr("count(*)").collect()
    val t2 = System.nanoTime()
    val g = graft.parse.GrokExtract.grok_extract(col("text"), graft.parse.GrokParser.Pattern)
    txt.select(g.getField("dur_ms").as("d")).selectExpr("max(d)").collect()
    println(f"SCALETEST cpus=$cpus grok_sec=${(System.nanoTime()-t2)/1e9}%.2f")
    val t1 = System.nanoTime()
    df.repartition(cpus.toInt, col("id")).selectExpr("max(id)").collect()
    println(f"SCALETEST cpus=$cpus shuffle_sec=${(System.nanoTime()-t1)/1e9}%.2f")
    spark.stop()
  }
}
