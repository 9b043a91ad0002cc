package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(Q × N); fine when the query set is small or N is bounded.
  *  - [[lshTopK]]: random-hyperplane LSH (sign-bit sketch) bucketing — the
  *    scale path. Each vector gets a `nPlanes`-bit signature from
  *    deterministic pseudo-random hyperplanes; candidates come from an
  *    equi-join on the signature (optionally multi-probe via banding), then
  *    exact cosine re-ranks only the bucket.
  *  - [[cosineNearDupPairs]]: embedding-cosine near-duplicate detection built
  *    on the same LSH bucketing.
  *
  * All vector math is `zip_with`/`aggregate` over the array columns —
  * codegen'd built-ins, no UDFs.
  */
object Ann {

  /** Σ a_i*b_i via zip_with + aggregate (both codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic ±1 hyperplane component for (plane p, dim d): the sign of
    * xxhash64(p, d). Replaces a driver-side RNG so executors regenerate the
    * same planes with zero broadcast. */
  private def planeSign(p: Int, d: Column): Column =
    when(xxhash64(lit(p), d) % 2 === 0, lit(1.0d)).otherwise(lit(-1.0d))

  /** nPlanes-bit sign signature of an embedding. */
  def signature(emb: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, d) => x * planeSign(p, d)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Exact cosine top-k neighbors for each query vector.
    * `queries` and `corpus` both need (id, embedding). */
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
    def banded(df: DataFrame, idName: String, embName: String): DataFrame =
      df.select(col("vec_id").as(idName), col("embedding").as(embName),
          signature(col("embedding"), nPlanes).as("sig"))
        .select(col(idName), col(embName),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => call_function("shiftright", col("sig"), (b * r).cast("int"))
              .bitwiseAND(lit((1L << r) - 1)))))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_val")
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

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= threshold)
    * via the same LSH bucketing. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double = 0.95,
      nPlanes: Int = 16, bands: Int = 4): DataFrame = {
    val r = nPlanes / bands
    val b = corpus.select(col("vec_id"), col("embedding"),
        signature(col("embedding"), nPlanes).as("sig"))
      .select(col("vec_id"), col("embedding"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          i => call_function("shiftright", col("sig"), (i * r).cast("int"))
            .bitwiseAND(lit((1L << r) - 1)))))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val l = b.select(col("band_idx"), col("band_val"),
      col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val rr = b.select(col("band_idx"), col("band_val"),
      col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    l.join(rr, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "emb_a", "emb_b").distinct()
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
