package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.{Ann, Pq}

/** One-off probe: PQ recall vs brute force + reconstruction quality. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 16)
    val m = Pq.train(emb)
    val codes = Pq.encode(emb, m)
    val rc = emb.join(codes, "vec_id")
      .select(avg(Ann.cosine(col("embedding"), Pq.decodeExpr(m, col("code")))).as("avg_recon"))
      .head().getDouble(0)
    println(f"AVG_RECON=$rc%.4f")
    val exact = Ann.bruteForceTopK(queries, emb, 5).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (sl <- Seq(16, 32, 64)) {
      val pq = Pq.topK(queries, emb, m, 5, shortlist = sl).select("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"SHORTLIST=$sl RECALL=${(pq intersect exact).size.toDouble / exact.size}%.3f")
    }
    spark.stop()
  }
}
