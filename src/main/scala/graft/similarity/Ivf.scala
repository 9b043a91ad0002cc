package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private def centroidDf(spark: SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.centroids.toSeq.toDF("centroid_id", "centroid")
  }

  /** Nearest-centroid assignment via a broadcast cross join + rank —
    * centroid table is O(nLists), so this is a map-side operation. */
  def assign(corpus: DataFrame, m: Model, nProbe: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    val cents = centroidDf(spark, m)
    val dist2 = aggregate(
      zip_with(col("embedding").cast("array<double>"), col("centroid"),
        (x, c) => (x - c) * (x - c)),
      lit(0.0d), (acc, x) => acc + x)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("centroid_id"))
    corpus
      .crossJoin(broadcast(cents))
      .withColumn("d2", dist2)
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nProbe)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** IVF top-k: probe `nProbe` lists per query, exact cosine rerank inside. */
  def topK(queries: DataFrame, corpus: DataFrame, m: Model,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    val corpusLists = assign(corpus, m, nProbe = 1)
      .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"), col("centroid_id"))
    val queryProbes = assign(queries, m, nProbe = nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("centroid_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    queryProbes.join(corpusLists, Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id", "q_emb", "c_emb").distinct()
      .withColumn("cos", Ann.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }
}
