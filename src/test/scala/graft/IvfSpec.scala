package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Ann, Ivf}

class IvfSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("IVF finds an exact duplicate (same centroid by construction)") {
    val clone = emb.filter(col("vec_id") === 11)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(clone)
    val m = Ivf.train(corpus, nLists = 8)
    val top1 = Ivf.topK(corpus.filter(col("vec_id") === 11), corpus, m, k = 1, nProbe = 1)
      .collect()
    assert(top1.length === 1 && top1(0).getLong(1) === 10011L)
  }

  test("IVF recall@5 vs brute force is reasonable with multi-probe") {
    val queries = emb.filter(col("vec_id") < 12)
    val m = Ivf.train(emb, nLists = 8)
    val exact = Ann.bruteForceTopK(queries, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.topK(queries, emb, m, k = 5, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // ranks well-formed
    val ranks = Ivf.topK(queries, emb, m, k = 5, nProbe = 4)
      .groupBy("query_id").agg(min("rank").as("mn"), max("rank").as("mx"))
      .collect()
    assert(ranks.forall(_.getInt(1) === 1))
  }
}
