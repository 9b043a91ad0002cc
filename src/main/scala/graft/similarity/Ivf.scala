package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to [[Ann.lshTopK]] (builder prompt: "an IVF or LSH-bucketed variant").
  *
  * Standard IVF-Flat construction (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", coarse-quantizer half):
  *  1. train a coarse quantizer (k-means, MLlib — runs distributed, the
  *     model is a tiny centroid table);
  *  2. assign every corpus vector to its nearest centroid → inverted lists
  *     keyed by centroid id (a plain keyed table — Spark-native layout);
  *  3. a query probes its nProbe nearest centroids and exact-reranks only
  *     those lists — an equi-join on centroid_id instead of a cross join.
  *
  * Scale: the corpus join key is a small int; list sizes are ~N/k so the
  * rerank work per query drops by k/nProbe; the centroid table broadcasts.
  * Determinism: fixed seed, fixed maxIter.
  */
object Ivf {

  final case class Model(centroids: Array[(Int, Array[Double])], nLists: Int)

  /** Train the coarse quantizer on the corpus (id, embedding:array<float>). */
  def train(corpus: DataFrame, nLists: Int = 16, seed: Long = 42L): Model = {
    val km = new KMeans()
      .setK(nLists).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features")
    val feats = corpus.select(array_to_vector(
      col("embedding").cast("array<double>")).as("features"))
    val model = km.fit(feats)
    Model(model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }, nLists)
  }

  /** Nearest-centroid assignment as ONE projection: the centroid matrix is a
    * plan constant inside a [[graft.functions.NearestCentroids]] codegen
    * kernel, so assignment has zero exchange — no crossJoin row blow-up and
    * no row_number window shuffle (the round-1 plan paid a ×nLists explode
    * plus a full shuffle on vec_id just to pick an argmin). */
  def assign(corpus: DataFrame, m: Model, nProbe: Int = 1): DataFrame = {
    val matrix = m.centroids.sortBy(_._1).map(_._2)
    corpus.select(col("vec_id"), col("embedding"),
      explode(graft.functions.VectorFunctions.nearest_centroids(
        col("embedding"), matrix, nProbe)).as("centroid_id"))
  }

  /** IVF top-k: probe `nProbe` lists per query, exact cosine rerank inside. */
  def topK(queries: DataFrame, corpus: DataFrame, m: Model,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    val corpusLists = assign(corpus, m, nProbe = 1)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"), col("centroid_id"))
    val queryProbes = assign(queries, m, nProbe = nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("centroid_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    // no candidate dedup needed: each corpus vector lives in exactly ONE
    // list (nProbe=1 assignment) and a query's probes are distinct centroid
    // ids, so the equi-join emits every (query, cand) pair at most once —
    // a distinct here would be a pure extra exchange
    queryProbes.join(corpusLists, Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", Ann.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }
}
