package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity — the verification metric used standalone.
  *
  * Pair enumeration here is blocked by a cheap length band (docs whose shingle
  * counts differ by more than the threshold allows can't reach it:
  * J(A,B) >= t  ⇒  |A| / |B| >= t), which prunes the quadratic space before
  * the join. For full-scale near-dup use MinHashLSH; this operator is the
  * exact-metric building block and the oracle for LSH recall tests.
  */
object NgramJaccard {

  def wordNgrams(text: Column, n: Int): Column =
    array_distinct(MinHashLSH.shingles(text, n))

  /** All pairs (id_a < id_b) with exact Jaccard >= threshold.
    * Length-band blocking: ceil(|A| * t) <= |B| <= floor(|A| / t). */
  def pairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      wordNgrams(col(textCol), n).as("sh"))
      .withColumn("len", size(col("sh")))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("len").as("len_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("len").as("len_b"))
    a.join(b,
        col("id_a") < col("id_b") &&
          col("len_b") >= ceil(col("len_a") * threshold) &&
          col("len_b") <= floor(col("len_a") / threshold))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", col("len_a") + col("len_b") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
