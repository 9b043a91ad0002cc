package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Ann, Pq}

class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val model = Pq.train(emb)

  test("codes are one bigint per vector with in-range per-subspace bytes") {
    val codes = Pq.encode(emb, model)
    assert(codes.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("vec_id", "bigint"), ("code", "bigint")))
    val vals = codes.collect().map(_.getLong(1))
    assert(vals.length === emb.count())
    // every packed byte must be a valid codebook index
    assert(vals.forall { c =>
      (0 until model.m).forall { i => ((c >> (8 * i)) & 0xffL) < model.ksub }
    })
    // deterministic across invocations (fixed seeds, fixed maxIter)
    val again = Pq.encode(emb, Pq.train(emb)).collect().map(_.getLong(1))
    assert(vals.toSeq === again.toSeq)
  }

  test("decode reconstructs within quantization error; a centroid round-trips near-exactly") {
    val codes = Pq.encode(emb, model)
    val avgRecon = emb.join(codes, "vec_id")
      .select(avg(Ann.cosine(col("embedding"), Pq.decodeExpr(model, col("code")))))
      .head.getDouble(0)
    assert(avgRecon > 0.5, s"reconstruction collapsed: $avgRecon")
    // a vector assembled FROM codebook centroids must round-trip ~exactly
    val synth = (0 until model.m).flatMap(i => model.codebooks(i)(3).map(_.toFloat)).toArray
    import spark.implicits._
    val one = Seq((999000L, synth)).toDF("vec_id", "embedding")
    val rt = one.join(Pq.encode(one, model), "vec_id")
      .select(Ann.cosine(col("embedding"), Pq.decodeExpr(model, col("code"))))
      .head.getDouble(0)
    assert(rt > 0.999999, s"centroid round-trip cosine $rt")
  }

  test("PQ finds an exact duplicate (identical codes, exact rerank)") {
    val clone = emb.filter(col("vec_id") === 11)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(clone)
    val m = Pq.train(corpus)
    val top1 = Pq.topK(corpus.filter(col("vec_id") === 11), corpus, m,
      k = 1, shortlist = 16).collect()
    assert(top1.length === 1 && top1(0).getLong(1) === 10011L)
    assert(top1(0).getDouble(2) > 0.999999)
  }

  test("IVF-PQ: probed lists + code scoring finds the exact duplicate; recall reasonable") {
    import graft.similarity.Ivf
    val clone = emb.filter(col("vec_id") === 11)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(clone)
    val ivf = Ivf.train(corpus, nLists = 8)
    val pq = Pq.train(corpus)
    val top1 = Pq.ivfPqTopK(corpus.filter(col("vec_id") === 11), corpus, ivf, pq,
      k = 1, nProbe = 1, shortlist = 16).collect()
    assert(top1.length === 1 && top1(0).getLong(1) === 10011L)

    val queries = emb.filter(col("vec_id") < 16)
    val exact = Ann.bruteForceTopK(queries, emb, 5).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf8 = Ivf.train(emb, nLists = 8)
    val got = Pq.ivfPqTopK(queries, emb, ivf8, model, k = 5, nProbe = 4, shortlist = 64)
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ recall@5: $recall")
  }

  test("recall@5 vs brute force grows with the shortlist and is >= 0.6 at 64") {
    val queries = emb.filter(col("vec_id") < 16)
    val exact = Ann.bruteForceTopK(queries, emb, 5).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(shortlist: Int): Double = {
      val got = Pq.topK(queries, emb, model, 5, shortlist).select("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val r16 = recall(16)
    val r64 = recall(64)
    assert(r64 >= r16, s"recall must not shrink with a larger shortlist: $r16 -> $r64")
    assert(r64 >= 0.6, s"recall@5 with shortlist 64: $r64")
  }
}
