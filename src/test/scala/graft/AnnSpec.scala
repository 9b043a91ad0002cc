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
    // the fixture has no natural near-dups (max pairwise cosine ≈ 0.51), so
    // honest 16-bit bands bucket almost nothing together — plant clones to
    // guarantee candidates, as the driver queries do
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val clones = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val res = Ann.lshTopK(emb.filter(col("vec_id") < 8), emb.unionByName(clones), k = 5)
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

  test("hyperplane_sig kernel is bit-identical to the HOF formulation it replaced") {
    // the original interpreted formulation, kept here as the semantic oracle
    def planeSign(p: Int, d: org.apache.spark.sql.Column) =
      when(xxhash64(lit(p), d) % 2 === 0, lit(1.0d)).otherwise(lit(-1.0d))
    def hofSignature(emb: org.apache.spark.sql.Column, nPlanes: Int) =
      (0 until nPlanes).map { p =>
        val proj = aggregate(
          zip_with(emb, sequence(lit(0), size(emb) - 1), (x, d) => x * planeSign(p, d)),
          lit(0.0d), (acc, x) => acc + x)
        when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val diff = emb.select(
        Ann.signature(col("embedding"), 16).as("kernel"),
        hofSignature(col("embedding"), 16).as("hof"))
      .filter(col("kernel") =!= col("hof")).count()
    assert(diff === 0L)
  }

  test("cosine_sim kernel is bit-identical to the double-HOF formulation") {
    // NB: the round-1 HOF ran zip_with over the raw float arrays, so products
    // rounded to float32 before accumulating; the kernel (like the DuckDB
    // oracle, which casts to DOUBLE[]) multiplies in double — this reference
    // formulation casts first to pin the kernel to the double semantics.
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    def norm(a: org.apache.spark.sql.Column) =
      sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val l = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val r = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val diff = l.join(r, col("id_a") < col("id_b"))
      .select(Ann.cosine(col("ea"), col("eb")).as("kernel"),
        (dot(col("ea"), col("eb")) / (norm(col("ea")) * norm(col("eb")))).as("hof"))
      .filter(col("kernel") =!= col("hof")).count()
    assert(diff === 0L)
  }

  test("signature plan is one codegen kernel — no interpreted HOF remains") {
    import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ZipWith}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = emb.select(Ann.signature(col("embedding"), 16).as("sig"))
      .queryExecution.optimizedPlan
    val hofs = plan.expressions.flatMap(_.collect {
      case e: ArrayAggregate => e
      case e: ZipWith => e
    })
    assert(hofs.isEmpty, s"interpreted HOFs in signature plan: $hofs")
    assert(plan.toString.contains("hyperplane_sig"))
  }

  test("LSH near-dup pairs ⊆ exact pairs (precision 1); full recall at tight threshold") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val clones = emb.filter(col("vec_id").isin(2L, 5L, 9L))
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(clones)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Ann.exactNearDupPairs(corpus, threshold = 0.999))
    val lsh = pairSet(Ann.cosineNearDupPairs(corpus, threshold = 0.999))
    assert(lsh.subsetOf(exact), s"LSH emitted non-near-dup pairs: ${lsh -- exact}")
    // identical vectors share every band, so the cloned pairs MUST be found
    assert(Set((2L, 10002L), (5L, 10005L), (9L, 10009L)).subsetOf(lsh))
  }

  test("degenerate corpus: bucket cap bounds candidates; drops are counted, planted pair survives") {
    // 300 IDENTICAL vectors — the adversarial corpus for any LSH: every band
    // bucket holds all of them, so uncapped banding would generate
    // ~300²/2 × bands candidate pairs. The cap must drop those buckets
    // (observably) while a disjoint planted near-dup pair in its own tiny
    // bucket is still found.
    val rnd = new scala.util.Random(7)
    val giant = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val planted = Array.fill(16)(rnd.nextFloat() * 2 - 1)
    val corpus = ((0 until 300).map(i => (i.toLong, giant)) ++
      Seq((9000L, planted), (9001L, planted))).toDF("vec_id", "embedding")
    val p = Ann.LshParams(maxBucketSize = 64)
    val pairs = Ann.cosineNearDupPairs(corpus, threshold = 0.999, p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((9000L, 9001L)),
      s"expected only the planted pair (degenerate buckets dropped), got ${pairs.size} pairs")
    val oversized = Ann.oversizedBuckets(corpus, p).collect()
    assert(oversized.length === p.bands, s"every band's giant bucket must be counted: $oversized")
    assert(oversized.forall(_.getLong(2) === 300L))
    // the O(N·bands·cap) bound on generated candidates
    val candBound = corpus.count() * p.bands * p.maxBucketSize
    val cands = Ann.candidatePairs(corpus, p).count()
    assert(cands <= candBound, s"$cands candidates exceeds O(N·bands·cap) = $candBound")
    // IN-LINE drop observables: the same counts as oversizedBuckets, but
    // measured on the one banding aggregation the query already runs
    // (oversizedBuckets costs a second corpus scan + 128-plane kernel pass —
    // production reads the Observation instead)
    val obs = org.apache.spark.sql.Observation("lsh_drops")
    Ann.candidatePairs(corpus, p, Some(obs)).count()
    assert(obs.get("dropped_buckets") === p.bands.toLong,
      s"observed drops must match oversizedBuckets: ${obs.get}")
    assert(obs.get("dropped_ids") === 300L * p.bands)
    // and on the ANN path
    val obs2 = org.apache.spark.sql.Observation("lsh_topk_drops")
    val queries = Seq((9000L, planted)).toDF("vec_id", "embedding")
    Ann.lshTopK(queries, corpus, k = 1, p, Some(obs2)).count()
    assert(obs2.get("dropped_buckets") === p.bands.toLong)
  }

  test("multi-table 16-bit bands keep high recall on genuine near-dups (cos ≈ 0.99)") {
    // jitter each fixture vector by ~1% L2 — cosine ≈ 0.999; with 8
    // independent 16-bit tables expected recall ≈ 1-(1-p^16)^8 ≈ 0.99 at
    // p ≈ 0.99. Everything is hash-deterministic, so the measured recall is
    // a fixed number; assert a conservative floor.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val jittered = emb.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x * (lit(1.0f) + (xxhash64(col("vec_id"), i) % 7).cast("float") / lit(1000f)))
        .as("embedding"),
      col("label"))
    val corpus = emb.unionByName(jittered)
    val found = Ann.cosineNearDupPairs(corpus, threshold = 0.99)
      .filter(col("id_b") === col("id_a") + 10000)
      .count()
    val total = emb.count()
    assert(found >= (total * 0.8).toLong, s"recall ${found.toDouble / total} below 0.8")
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
