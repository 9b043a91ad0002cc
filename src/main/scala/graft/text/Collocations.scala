package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointwise-mutual-information collocation mining — which token pairs
  * co-occur far more than chance ("new york", "machine learning"): the
  * association-mining half of the text family (tf/df weigh single terms,
  * PMI scores PAIRS), used for phrase vocabularies, tokenizer merge
  * candidates, and boilerplate signature discovery.
  *
  *   pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ),  p over bigram/unigram positions
  *
  * Emitted as floor'd integer milli-units. The ratio is computed in one
  * fixed double-op order mirrored by the oracle; counts are exact bigints.
  * A `minCount` cutoff drops the noise tail (PMI's known bias: a pair seen
  * once has spuriously high association).
  *
  * Shuffle shape: one (w1, w2) hash aggregation over exploded bigrams, one
  * unigram aggregation, two joins of the BIGRAM table against the unigram
  * counts (broadcast — a unigram vocabulary fits in memory at any corpus
  * size that has one). Corpus totals ride one scalar aggregate. Documents
  * shorter than two tokens contribute unigrams but no bigrams. */
object Collocations {

  /** (w1, w2, cab, pmi_milli) for every adjacent pair with `cab >= minCount`. */
  def pmi(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount out of range: $minCount")
    val base = docs.select(
      TextAnalysis.tokens(lower(col(textCol))).as("toks"))
    val uni = base.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = base.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS w1, toks[i] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minCount)
    val totals = base.agg(
      sum(size(col("toks")).cast("long")).as("nuni"),
      sum(greatest(size(col("toks")) - 1, lit(0)).cast("long")).as("nbig"))
      .collect().head
    val nUni = totals.getAs[Long]("nuni").toDouble
    val nBig = totals.getAs[Long]("nbig").toDouble
    bi.join(broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "ca")), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "cb")), Seq("w2"))
      .select(col("w1"), col("w2"), col("cab"),
        floor(lit(1000.0) * log(
          (col("cab") / lit(nBig)) /
            ((col("ca") / lit(nUni)) * (col("cb") / lit(nUni)))))
          .cast("long").as("pmi_milli"))
  }
}
