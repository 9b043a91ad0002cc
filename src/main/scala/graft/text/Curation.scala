package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.ExactDedup

/** The full training-data curation DAG, composed end-to-end from the
  * individually oracle-checked operators:
  *
  *   exact dedup → quality gate → language ID → stratified mix sampling →
  *   PII scrub → deterministic train/valid split → export shuffle →
  *   per-split sequence packing in EXPORT order
  *
  * One declarative plan: Catalyst sees the whole chain, so column pruning
  * and predicate ordering cross stage boundaries (e.g. the quality gate
  * runs before the scrub regexes ever execute). Every stage is
  * deterministic — md5-bucket verdicts for sampling/split, md5-keyed
  * export order — so the exported corpus is bit-identical on any engine,
  * cluster size or rerun.
  *
  * Packing runs per (split, shard): train and valid packs never mix (a
  * loader reads one split), and within a split each shard packs its own
  * md5-shuffled order — parallelism = nShards per split, no global sort.
  *
  * Output: one row per exported document —
  * (doc_id, lang, split, shard, ord, pack_id, n_tokens, clean_text).
  */
object Curation {

  final case class Config(
      minQuality: Long = 300,
      rates: Map[String, Double] = Map("en" -> 0.5, "und" -> 0.25),
      defaultRate: Double = 1.0,
      mixSalt: String = "mix",
      validHexThreshold: String = "2000",
      nShards: Int = 8,
      maxTokens: Int = 2048)

  def run(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val gated = TextAnalysis.qualityFeatures(ExactDedup.dedup(docs))
      .filter(col("quality_score") >= cfg.minQuality)
      .withColumn("lang", TextAnalysis.langGuess(col("text")))
    val sampled = TextAnalysis.stratifiedSample(
      gated, "lang", cfg.rates, cfg.defaultRate, cfg.mixSalt)
    val base = sampled.select(
      col("doc_id"), col("lang"),
      TextAnalysis.datasetSplit(col("doc_id"),
        validHexThreshold = cfg.validHexThreshold).as("split"),
      TextAnalysis.scrub(col("text")).as("clean_text"))
    // the annotating window forms keep the chain a SINGLE linear plan — the
    // projecting operators would force self-joins that re-evaluate the
    // scan→dedup→gate subtree once per join (4 scans instead of 1; the plan
    // audit that motivated this is CurationSpec's exchange-count bound).
    // Token budget counts the text the loader actually sees (post-scrub);
    // the (split, shard) pack partition keeps train/valid packs disjoint.
    val ordered = TextAnalysis.withExportOrder(base, cfg.nShards)
    TextAnalysis.withPacks(ordered, cfg.maxTokens, Seq("split", "shard"),
      orderCol = "ord", textCol = "clean_text")
      .select(col("doc_id"), col("lang"), col("split"), col("shard"),
        col("ord"), col("pack_id"), col("n_tokens"), col("clean_text"))
  }
}
