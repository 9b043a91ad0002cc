package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WordShinglesFunctions.word_shingles

/** Train/test contamination check — the decontamination primitive every
  * training-data pipeline runs before trusting an eval split: for each test
  * document, the fraction of its word n-grams that appear ANYWHERE in the
  * training corpus. A test doc whose shingles are largely covered by train
  * is leaked, not held out (the n-gram-overlap method popularized by the
  * GPT-3/PaLM decontamination appendices).
  *
  * Distinct-shingle semantics on both sides: a shingle repeated inside one
  * test doc counts once, and the train side is a distinct shingle SET — so
  * the score measures coverage, not frequency. Shingling rides the codegen
  * [[graft.functions.WordShingles]] kernel (same normalization as the
  * near-dup family: lowercase, whitespace runs); its short-doc contract
  * carries over — a doc shorter than `n` tokens contributes its whole text
  * as one shingle, so a tiny test doc fully contained in train still scores
  * 1000. NULL-text docs have no content and are absent from the output.
  *
  * Scale shape: ONE data-sized shuffle — the left join on shingle hash
  * (both sides pre-shrunk by distinct's partial aggregation); the per-doc
  * score is a count/sum aggregate on doc id. At corpus scale the train
  * shingle set is the big side: prefilter the join with a bloom of the test
  * shingles ([[graft.dedup.BloomDedup]]'s trick) when test ≪ train.
  * Scores are integer milli (floor) — reshuffle-exact, oracle-hashable. */
object Contamination {

  /** (doc_id, n_shingles, n_matched, contaminated_milli) per test document. */
  def overlap(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    def shingled(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      explode(word_shingles(col(textCol), n)).as("sh"))
    val trainSet = shingled(train).select(col("sh")).distinct()
    val testSh = shingled(test).distinct()
    testSh.join(trainSet.withColumn("__hit", lit(1L)), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_matched"))
      .withColumn("contaminated_milli",
        expr("n_matched * 1000L div n_shingles"))
  }
}
