package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{functions => gf}

/** SimHash near-duplicate detection.
  *
  * 64-bit Charikar simhash per document (one-pass custom codegen expression,
  * [[graft.functions.SimHash64]]), then pigeonhole banding: two docs within
  * Hamming distance k < 4 share at least one of 4 identical 16-bit chunks, so
  * candidate pairs come from equi-joining on (chunk_idx, chunk_value) — the
  * same shuffle shape as MinHash LSH, no O(n²) compare.
  */
object SimHashDedup {

  def withSimhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("id"),
      gf.simhash64(split(ExactDedup.normalized(col(textCol)), " ")).as("simhash"))

  /** Near-dup pairs with Hamming distance <= maxHamming (must be < 4 for the
    * 4-chunk pigeonhole to be exact). */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxHamming < 4, "4-chunk banding only guarantees recall for hamming < 4")
    val sh = withSimhash(docs, textCol, idCol)
    val chunked = sh.select(col("id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        i => call_function("shiftright", col("simhash"), (i * 16).cast("int"))
          .bitwiseAND(lit(0xffffL)))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    val buckets = chunked
      .groupBy("chunk_idx", "chunk_val")
      .agg(collect_list(struct(col("id"), col("simhash"))).as("members"))
      .filter(size(col("members")) > 1)
    buckets
      .select(explode(flatten(transform(col("members"), a =>
        transform(filter(col("members"), b => b.getField("id") > a.getField("id")),
          b => struct(
            a.getField("id").as("id_a"),
            b.getField("id").as("id_b"),
            bit_count(a.getField("simhash").bitwiseXOR(b.getField("simhash"))).as("hamming")))
      ))).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
