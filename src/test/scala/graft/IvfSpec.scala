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

  test("assign is a zero-exchange projection and matches a scala-side argmin") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val m = Ivf.train(emb, nLists = 8)
    val assigned = Ivf.assign(emb.filter(col("vec_id") < 50), m, nProbe = 2)
    // plan shape: no join, no window — the centroid matrix rides inside the
    // kernel expression, so assignment never shuffles
    val lp = assigned.queryExecution.optimizedPlan
    assert(!lp.exists(_.isInstanceOf[Join]), s"join in assign plan:\n$lp")
    assert(!lp.exists(_.isInstanceOf[LWindow]), s"window in assign plan:\n$lp")
    // correctness: same (d2 asc, id asc) top-2 as a driver-side recompute
    val got = assigned.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getInt(2)).toSet }
    val matrix = m.centroids.sortBy(_._1).map(_._2)
    val vecs = emb.filter(col("vec_id") < 50).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecs.foreach { case (id, v) =>
      val want = matrix.zipWithIndex.map { case (c, ci) =>
        var d2 = 0.0; var i = 0
        while (i < v.length) { val d = v(i).toDouble - c(i); d2 += d * d; i += 1 }
        (d2, ci)
      }.sortBy(identity).take(2).map(_._2).toSet
      assert(got(id) === want, s"vec $id assignment")
    }
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
