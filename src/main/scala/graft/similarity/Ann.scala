package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over an embedding column (array<float>).
  *
  * Paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(Q × N); fine when the query set is small or N is bounded.
  *  - [[lshTopK]]: random-hyperplane LSH (sign-bit sketch) bucketing — the
  *    scale path. Each vector gets a `nPlanes`-bit signature from
  *    deterministic pseudo-random hyperplanes; candidates come from an
  *    equi-join on signature bands (multi-probe), then exact cosine re-ranks
  *    only the bucket.
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

  /** LSH-bucketed ANN: candidates share a signature band, re-ranked exactly.
    * bands of bits (multi-probe) trade recall vs candidate count. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 16, bands: Int = 4): DataFrame = {
    val r = nPlanes / bands
    require(r * bands == nPlanes)
    // HOF-free band explosion: bands is a compile-time constant, so the band
    // values are `bands` explicit struct expressions exploded from a literal
    // array — everything stays in whole-stage codegen (transform() lambdas
    // always run interpreted). explode_outer, not explode: the array is
    // provably non-empty, and the outer form stops the optimizer from
    // inferring a size>0 filter that would inline the signature expression.
    def banded(df: DataFrame, idName: String, embName: String): DataFrame =
      df.select(col("vec_id").as(idName), col("embedding").as(embName),
          signature(col("embedding"), nPlanes).as("sig"))
        .select(col(idName), col(embName), explode_outer(array(
          (0 until bands).map(b => struct(
            lit(b).as("band_idx"),
            call_function("shiftright", col("sig"), lit(b * r))
              .bitwiseAND(lit((1L << r) - 1)).as("band_val"))): _*)).as("bv"))
        .select(col(idName), col(embName), col("bv.band_idx"), col("bv.band_val"))
    val qb = banded(queries, "query_id", "q_emb")
    val cb = banded(corpus, "cand_id", "c_emb")
    val cands = qb.join(cb, Seq("band_idx", "band_val"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id", "q_emb", "c_emb")
      .distinct()
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    cands
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
    * path: only pairs sharing a signature band are scored (recall < 1 by
    * construction; precision = 1, every emitted pair is exact-cosine
    * verified — AnnSpec asserts the subset property against
    * [[exactNearDupPairs]]). */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double = 0.95,
      nPlanes: Int = 16, bands: Int = 4): DataFrame = {
    val r = nPlanes / bands
    // HOF-free band explosion — same construction as lshTopK's `banded`
    val b = corpus.select(col("vec_id"), col("embedding"),
        signature(col("embedding"), nPlanes).as("sig"))
      .select(col("vec_id"), col("embedding"), explode_outer(array(
        (0 until bands).map(i => struct(
          lit(i).as("band_idx"),
          call_function("shiftright", col("sig"), lit(i * r))
            .bitwiseAND(lit((1L << r) - 1)).as("band_val"))): _*)).as("bv"))
      .select(col("vec_id"), col("embedding"), col("bv.band_idx"), col("bv.band_val"))
    val l = b.select(col("band_idx"), col("band_val"),
      col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val rr = b.select(col("band_idx"), col("band_val"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    l.join(rr, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "emb_a", "emb_b").distinct()
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
