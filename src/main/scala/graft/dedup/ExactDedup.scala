package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication over a text column.
  *
  * Scale design: group on a 128-bit content fingerprint (md5 of the
  * normalized text), NOT the raw text — the shuffle then carries 16-byte keys
  * instead of multi-KB documents, and map-side partial aggregation collapses
  * in-partition duplicates before the exchange. Keeper selection is
  * min(doc_id) for determinism.
  */
object ExactDedup {

  def normalized(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** One row per distinct normalized text: keeper id + duplicate count. */
  def groups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(md5(normalized(col(textCol))).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated document set (full rows, keeper per group).
    * Window row_number over the fingerprint avoids a join-back. */
  def dedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(normalized(col(textCol)))).orderBy(col(idCol))
    docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
