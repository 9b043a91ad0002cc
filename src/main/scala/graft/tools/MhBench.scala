package graft.tools
import org.apache.spark.sql.SparkSession
object MhBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", graft.util.Env.localDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    val t0 = System.nanoTime()
    val n = graft.dedup.MinHashLSH.nearDupPairs(docs,
      graft.dedup.MinHashLSH.Params(3, 32, 8, 64, Some(0.5))).count()
    println(f"MHBENCH pairs=$n sec=${(System.nanoTime()-t0)/1e9}%.2f")
    spark.stop()
  }
}
