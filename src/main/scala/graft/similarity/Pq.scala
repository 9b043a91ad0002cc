package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization ANN — the memory-compression half of Jégou et al.
  * ("Product Quantization for Nearest Neighbor Search"; [[Ivf]] is the
  * coarse-quantizer half):
  *
  *  1. split the d-dim embedding into `m` subvectors, train a tiny k-means
  *     codebook (ksub centroids) per subspace — MLlib fits, the model is
  *     m × ksub × (d/m) doubles, broadcast-sized;
  *  2. encode every corpus vector as m sub-centroids ids packed into ONE
  *     bigint — 8 bytes per vector instead of 4·d (32× compression at
  *     d=64): the exhaustive scan reads codes, never embeddings;
  *  3. query: score cosine(query, decode(code)) — decode is per-subspace
  *     lookup on plan-constant literal maps, so the whole scan is built-in
  *     expressions inside codegen — shortlist the best, then exact-rerank
  *     only the shortlist against the full-precision embeddings.
  *
  * Scale: the scan side of the join carries (vec_id, code) = 16 bytes/row;
  * full-precision embeddings are touched only for shortlist×queries rows.
  * Recall < 1 by construction (quantization error); precision of the final
  * scores = 1 (exact rerank). PqSpec measures recall against
  * [[Ann.bruteForceTopK]] and pins the reconstruction quality.
  */
object Pq {

  /** codebooks(i)(c) = centroid (length d/m) for code c of subspace i. */
  final case class Model(m: Int, ksub: Int, d: Int,
      codebooks: Array[Array[Array[Double]]])

  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
      seed: Long = 42L): Model = {
    val d = corpus.select(size(col("embedding"))).head().getInt(0)
    require(d % m == 0, s"m=$m must divide dim=$d")
    require(ksub <= 256, "one byte per subspace code")
    val sub = d / m
    // the m sub-quantizer fits are independent — submit them as concurrent
    // Spark jobs (the scheduler interleaves their tiny stages; serial fits
    // pay m× the per-job overhead, which dominates at small k)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val books = Await.result(Future.sequence((0 until m).map { i =>
      Future {
        val km = new KMeans()
          .setK(ksub).setSeed(seed + i).setMaxIter(20)
          .setFeaturesCol("features")
        val feats = corpus.select(array_to_vector(
          slice(col("embedding"), i * sub + 1, sub).cast("array<double>"))
          .as("features"))
        km.fit(feats).clusterCenters.map(_.toArray)
      }
    }), Duration.Inf).toArray
    Model(m, ksub, d, books)
  }

  /** m one-byte codes packed into a single bigint (zero-exchange
    * projection — each subspace assignment is a [[graft.functions.NearestCentroids]]
    * kernel over a plan-constant codebook). */
  def encode(corpus: DataFrame, mm: Model): DataFrame = {
    val sub = mm.d / mm.m
    val code = (0 until mm.m).map { i =>
      val c = element_at(graft.functions.VectorFunctions.nearest_centroids(
        slice(col("embedding"), i * sub + 1, sub), mm.codebooks(i), 1), 1)
      call_function("shiftleft", c.cast("long"), lit(8 * i))
    }.reduce(_.bitwiseOR(_))
    corpus.select(col("vec_id"), code.as("code"))
  }

  /** Reconstructed (quantized) embedding from a packed code: per-subspace
    * lookup on literal maps + flatten — built-ins only, stays in
    * whole-stage codegen. */
  def decodeExpr(mm: Model, code: Column): Column =
    flatten(array((0 until mm.m).map { i =>
      val ci = call_function("shiftright", code, lit(8 * i))
        .bitwiseAND(lit(255L)).cast("int")
      element_at(
        map_from_arrays(
          lit((0 until mm.ksub).toArray),
          array(mm.codebooks(i).toIndexedSeq.map(cb => lit(cb.map(_.toFloat))): _*)),
        ci)
    }: _*))

  /** IVF-PQ — the full composition of both quantizers (what FAISS calls
    * IVFPQ, the architecture that serves billion-vector indexes): the
    * candidate set comes from the query's nProbe inverted lists
    * ([[Ivf.assign]] equi-join on centroid_id — no exhaustive scan), each
    * candidate is scored from its 8-byte PQ code, and only the per-query
    * shortlist touches full-precision embeddings for the exact rerank.
    * Per-query work: (N·nProbe/nLists) code lookups + shortlist exact dots. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
      ivf: Ivf.Model, pq: Model, k: Int = 5, nProbe: Int = 4,
      shortlist: Int = 32): DataFrame = {
    val lists = Ivf.assign(corpus, ivf, nProbe = 1)
      .select(col("vec_id").as("cand_id"), col("centroid_id"))
      .join(encode(corpus, pq).select(col("vec_id").as("cand_id"), col("code")),
        Seq("cand_id"))
    val probes = Ivf.assign(queries, ivf, nProbe = nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("centroid_id"))
    // no candidate dedup needed: one inverted list per corpus vector
    // (nProbe=1 assignment) × distinct probe centroids per query ⇒ the join
    // emits each (query, cand) at most once (see Ivf.topK)
    val approx = probes.join(lists, Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("acos", Ann.cosine(col("q_emb"), decodeExpr(pq, col("code"))))
    shortlistRerank(approx, corpus, k, shortlist)
  }

  /** Shared tail of both PQ paths: keep the `shortlist` best approximate
    * scores per query, join the full-precision embeddings for those rows
    * only, exact-rerank to top-k (cand_id breaks ties at both stages). */
  private def shortlistRerank(approx: DataFrame, corpus: DataFrame,
      k: Int, shortlist: Int): DataFrame = {
    val wa = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("cand_id"))
    val short = approx
      .withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("q_emb"), col("cand_id"))
    val we = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    short
      .join(corpus.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb")),
        Seq("cand_id"))
      .withColumn("cos", Ann.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(we))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** PQ scan + exact rerank: the exhaustive pass touches only codes; the
    * full-precision embeddings join in for `shortlist` candidates/query. */
  def topK(queries: DataFrame, corpus: DataFrame, mm: Model,
      k: Int = 5, shortlist: Int = 32): DataFrame = {
    val codes = encode(corpus, mm)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val approx = q.crossJoin(codes.select(col("vec_id").as("cand_id"), col("code")))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("acos", Ann.cosine(col("q_emb"), decodeExpr(mm, col("code"))))
    shortlistRerank(approx, corpus, k, shortlist)
  }
}
