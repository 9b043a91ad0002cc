package graft

import org.apache.spark.sql.functions._
import graft.similarity.Ann

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding")

  test("brute-force top-k: handcrafted neighbors in the right order") {
    val d = vecs(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f), // closest to 0
      2L -> Seq(0f, 1f, 0f),
      3L -> Seq(0.5f, 0.5f, 0f)) // second-closest to 0
    val top = Ann.bruteForceTopK(d.filter(col("vec_id") === 0), d, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(top.toSeq === Seq((1L, 1), (3L, 2)))
  }

  test("identical vectors always share every LSH band (cosine near-dup found)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val clone = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(clone)
    val pairs = Ann.cosineNearDupPairs(corpus, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 10007L)), s"identical pair missing from $pairs")
  }

  test("LSH top-k returns correctly ranked exact cosines over its candidates") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val res = Ann.lshTopK(emb.filter(col("vec_id") < 8), emb, k = 5)
    val rows = res.collect()
    assert(rows.nonEmpty)
    // per query: ranks contiguous from 1, cosine non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to sorted.length).toSeq, s"query $q ranks")
      val cosines = sorted.map(_.getDouble(2))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b - 1e-12 }, s"query $q order")
    }
  }

  test("LSH top-1 matches brute force when an exact duplicate exists") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val clone = emb.filter(col("vec_id") === 3)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(clone)
    val top1 = Ann.lshTopK(corpus.filter(col("vec_id") === 3), corpus, k = 1)
      .collect()
    assert(top1.length === 1 && top1(0).getLong(1) === 10003L)
  }
}
