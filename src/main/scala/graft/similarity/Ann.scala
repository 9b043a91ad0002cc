package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over an embedding column (array<float>).
  *
  * Paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(Q × N); fine when the query set is small or N is bounded.
  *  - [[lshTopK]]: multi-table random-hyperplane LSH (sign-bit sketch,
  *    Charikar) — the scale path. Each vector gets `bands` independent
  *    `bitsPerBand`-bit keys from deterministic pseudo-random hyperplane
  *    families; candidates come from an equi-join on (band_idx, band_val)
  *    with capped buckets, then exact cosine re-ranks only the candidates.
  *  - [[exactNearDupPairs]] / [[cosineNearDupPairs]]: embedding-cosine
  *    near-duplicate detection — exact all-pairs (small scale / oracle duty)
  *    and the LSH-bucketed scale path.
  *
  * All vector math runs in custom one-pass codegen kernels
  * ([[graft.functions.CosineSim]], [[graft.functions.HyperplaneSig]]) —
  * the earlier `aggregate(zip_with(...))` formulation evaluated its lambdas
  * interpreted (HOFs never enter whole-stage codegen) and made nPlanes
  * passes per vector; the kernel is one compiled pass.
  */
object Ann {

  def cosine(a: Column, b: Column): Column = VectorFunctions.cosine_sim(a, b)

  /** nPlanes-bit sign signature of an embedding (one codegen pass). */
  def signature(emb: Column, nPlanes: Int): Column =
    VectorFunctions.hyperplane_sig(emb, nPlanes)

  /** Exact cosine top-k neighbors for each query vector.
    * `queries` and `corpus` both need (vec_id, embedding). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** Multi-table hyperplane-LSH parameters.
    *
    * Each of the `bands` tables is an independent `bitsPerBand`-bit plane
    * family (total planes = bands·bitsPerBand — NOT a slice of one 64-bit
    * signature, so wide band keys don't starve recall). Defaults give
    * 8 × 16-bit tables = 128 planes: 2^16 buckets per table, near-dup
    * recall ≈ 0.8 at cosine 0.95 (1 − (1 − p^16)^8, p = 1 − θ/π), and a
    * `maxBucketSize` cap that bounds candidate pairs at O(N·bands·cap)
    * even on a degenerate corpus (all-identical vectors) — dropped buckets
    * are counted, not silently ignored ([[oversizedBuckets]]), mirroring
    * [[graft.dedup.MinHashLSH.Params.maxBucketSize]]. */
  final case class LshParams(
      bitsPerBand: Int = 16,
      bands: Int = 8,
      maxBucketSize: Int = 256) {
    require(bitsPerBand >= 1 && bitsPerBand <= 64, s"bitsPerBand out of range: $bitsPerBand")
    require(bands >= 1, s"bands out of range: $bands")
    require(maxBucketSize >= 2, s"maxBucketSize out of range: $maxBucketSize")
  }

  /** (id, band_idx, band_val) rows — one compiled [[graft.functions.HyperplaneBands]]
    * pass computes every table's key; ids only, embeddings never enter the
    * band shuffle. posexplode_outer: the array is provably non-empty, and the
    * outer form stops the optimizer from inferring a size>0 filter that
    * would inline the kernel expression. */
  private def bandedIds(df: DataFrame, idName: String, p: LshParams): DataFrame =
    df.select(col("vec_id").as(idName),
        VectorFunctions.hyperplane_bands(col("embedding"), p.bitsPerBand, p.bands).as("bvs"))
      .select(col(idName), posexplode_outer(col("bvs")).as(Seq("band_idx", "band_val")))

  /** Attaches the cap observables to a freshly-aggregated bucket frame:
    * `dropped_buckets` / `dropped_ids` count what the `maxBucketSize` filter
    * is about to discard, measured ON the one banding aggregation the query
    * already runs (a CollectMetrics node — no extra scan, no extra kernel
    * pass; [[oversizedBuckets]] recomputes the full 128-plane banding and
    * exists for tests only). Read via `Observation.get` after the caller's
    * action completes. */
  private def withDropMetrics(buckets: DataFrame, p: LshParams,
      obs: Option[Observation]): DataFrame =
    obs.fold(buckets)(o => buckets.observe(o,
      sum(when(size(col("ids")) > p.maxBucketSize, lit(1L)).otherwise(lit(0L)))
        .as("dropped_buckets"),
      sum(when(size(col("ids")) > p.maxBucketSize, size(col("ids")).cast("long"))
        .otherwise(lit(0L))).as("dropped_ids")))

  /** Deduped candidate pairs (id_a < id_b) from the capped band buckets —
    * the stage before exact-cosine verification, exposed so callers and
    * tests can bound candidate volume (≤ N·bands·maxBucketSize/2 on any
    * corpus). Carries ONLY ids. Pass an [[Observation]] to read the cap's
    * dropped-bucket/dropped-id counts from the SAME aggregation. */
  def candidatePairs(corpus: DataFrame, p: LshParams = LshParams(),
      obs: Option[Observation] = None): DataFrame = {
    val buckets = withDropMetrics(
        bandedIds(corpus, "vec_id", p)
          .groupBy("band_idx", "band_val")
          .agg(collect_list(col("vec_id")).as("ids")), p, obs)
      .filter(size(col("ids")).between(2, p.maxBucketSize))
    graft.functions.PairGen.unorderedPairs(buckets, "ids").distinct()
  }

  /** Buckets whose size exceeded maxBucketSize (dropped from candidate
    * generation) — the out-of-line observable for TESTS, same contract as
    * [[graft.dedup.MinHashLSH.oversizedBuckets]]. Production callers should
    * pass an [[Observation]] to [[candidatePairs]]/[[lshTopK]] instead: this
    * form re-scans the corpus and re-runs the banding kernel. */
  def oversizedBuckets(corpus: DataFrame, p: LshParams = LshParams()): DataFrame =
    bandedIds(corpus, "vec_id", p)
      .groupBy("band_idx", "band_val").count()
      .filter(col("count") > p.maxBucketSize)

  /** LSH-bucketed ANN: candidates share a band-table bucket with the query,
    * re-ranked by exact cosine.
    *
    * Scale shape: band join and candidate dedup carry ONLY ids (the
    * embeddings re-join afterwards, each moving once per id instead of once
    * per candidate pair); corpus buckets over `maxBucketSize` are dropped
    * (pass an [[Observation]] for in-line dropped counts), bounding
    * per-query candidates at bands·cap on any corpus. Recall < 1 by
    * construction; emitted scores are exact. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      p: LshParams = LshParams(), obs: Option[Observation] = None): DataFrame = {
    // ONE corpus scan + signature-kernel pass: the cap filter, the drop
    // observables, and the join side all come from the same collect_list
    // aggregation (counting in a separate aggregate and joining it back
    // would scan the corpus — and run the 128-plane kernel — twice)
    val cbSmall = withDropMetrics(
        bandedIds(corpus, "cand_id", p)
          .groupBy("band_idx", "band_val")
          .agg(collect_list(col("cand_id")).as("ids")), p, obs)
      .filter(size(col("ids")) <= p.maxBucketSize)
      .select(col("band_idx"), col("band_val"), explode(col("ids")).as("cand_id"))
    val qb = bandedIds(queries, "query_id", p)
    val cands = qb
      .join(cbSmall, Seq("band_idx", "band_val"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id")
      .distinct()
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    cands.join(q, Seq("query_id")).join(c, Seq("cand_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    * cosine >= threshold) — all-pairs; the small-scale correctness baseline
    * and DuckDB-oracle twin of [[cosineNearDupPairs]]. */
  def exactNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val l = corpus.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val r = corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH bucketing — the scale
    * path: only pairs sharing a band-table bucket are scored (recall < 1 by
    * construction; precision = 1, every emitted pair is exact-cosine
    * verified — AnnSpec asserts the subset property against
    * [[exactNearDupPairs]]).
    *
    * Scale shape: buckets are collected per (band_idx, band_val) and capped
    * at `maxBucketSize` (degenerate buckets dropped + counted via
    * [[oversizedBuckets]]), in-bucket pairing is a codegen generator chain
    * ([[graft.functions.PairGen]]), and the candidate dedup exchange carries
    * only (id_a, id_b) — embeddings join back once per id for the exact
    * verify. Candidate pairs ≤ N·bands·maxBucketSize/2 on ANY corpus. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double = 0.95,
      p: LshParams = LshParams(), obs: Option[Observation] = None): DataFrame = {
    val pairs = candidatePairs(corpus, p, obs)
    val l = corpus.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val r = corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    pairs.join(l, Seq("id_a")).join(r, Seq("id_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
