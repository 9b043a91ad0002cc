package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (shingle → minhash → band → bucket-join).
  *
  * Standard construction (Broder '97; MMDS ch.3):
  *  - word w-shingles over the normalized text
  *  - numHashes minhash values h_i = min over shingles of xxhash64(i, shingle)
  *  - signature split into `bands` bands of r = numHashes/bands rows; band key
  *    = xxhash64 over the band's slice
  *  - candidate pairs = docs sharing any (band_idx, band_key) bucket
  *  - optional exact-Jaccard verification of candidates
  *
  * Scale design:
  *  - the bucket join is an equi-join on (band_idx, band_key) — shuffle keys
  *    are 16 bytes; the quadratic blow-up is confined to per-bucket groups.
  *  - `maxBucketSize` drops degenerate buckets (boilerplate shingle sets) the
  *    same way production dedup pipelines cap posting lists; dropped buckets
  *    are counted, not silently ignored (observable via `oversizedBuckets`).
  *  - signatures are computed in ONE projection (no per-hash scans of the doc)
  *    and candidates carry only (id, signature), never the document text.
  */
object MinHashLSH {

  final case class Params(
      shingleWords: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBucketSize: Int = 64,
      verifyJaccard: Option[Double] = Some(0.7))

  /** Word w-shingle array, normalized (custom codegen kernel — the
    * higher-order-function formulation ran interpreted, see
    * [[graft.functions.WordShingles]]). */
  def shingles(text: Column, w: Int): Column =
    graft.functions.WordShinglesFunctions.word_shingles(text, w)

  /** numHashes-wide minhash signature (array<bigint>) — one compiled pass
    * over the shingles ([[graft.functions.MinHashSignature]]). */
  def signature(shinglesCol: Column, numHashes: Int): Column =
    graft.functions.MinHashFunctions.minhash_signature(shinglesCol, numHashes)

  /** (band_idx, band_key) rows, one per band per doc.
    *
    * HOF-free band explosion: bands is a compile-time constant, so the band
    * keys are `bands` explicit xxhash64 expressions over signature slices,
    * exploded from a literal struct array — everything stays in whole-stage
    * codegen (transform() lambdas always run interpreted). explode_outer
    * keeps the optimizer from inferring a size>0 filter that would inline
    * the signature expression (the array is provably non-empty). */
  def bandedKeys(docs: DataFrame, p: Params, textCol: String, idCol: String): DataFrame = {
    val r = p.numHashes / p.bands
    require(r * p.bands == p.numHashes, "bands must divide numHashes")
    docs
      .select(col(idCol).as("id"),
        signature(shingles(col(textCol), p.shingleWords), p.numHashes).as("sig"))
      .select(col("id"), explode_outer(array((0 until p.bands).map { b =>
        struct(lit(b).as("band_idx"),
          xxhash64(lit("band") +: (0 until r).map(i =>
            element_at(col("sig"), b * r + i + 1)): _*).as("band_key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band_idx"), col("bk.band_key"))
  }

  /** Buckets whose size exceeded maxBucketSize (dropped from pairing). */
  def oversizedBuckets(docs: DataFrame, p: Params = Params(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bandedKeys(docs, p, textCol, idCol)
      .groupBy("band_idx", "band_key").count()
      .filter(col("count") > p.maxBucketSize)

  /** Candidate near-duplicate pairs (id_a < id_b), optionally verified with
    * exact Jaccard over the shingle sets. */
  def nearDupPairs(docs: DataFrame, p: Params = Params(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val banded = bandedKeys(docs, p, textCol, idCol)
    val smallBuckets = banded
      .groupBy("band_idx", "band_key")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, p.maxBucketSize))
    // in-bucket pairing via the shared generator chain (codegen; the earlier
    // transform/filter/flatten formulation ran its lambdas interpreted) —
    // the bucket is already local post-shuffle, so this is a flatMap, not a
    // join, and the dedup exchange carries only (id_a, id_b)
    val pairs = graft.functions.PairGen.unorderedPairs(smallBuckets, "ids")
      .distinct()
    p.verifyJaccard match {
      case None => pairs
      case Some(threshold) =>
        // Verify only the CANDIDATES' shingle sets. The round-6 form joined
        // the raw (id, shingles) projection twice, so the whole corpus was
        // scanned and re-shingled two more times to verify a sparse pair
        // set. Now: the pair set is localCheckpointed once (it is referenced
        // three times below — by both join sides and the id set; without the
        // checkpoint each reference would re-run the full LSH lineage), the
        // candidate id set prunes the docs scan with a broadcast semi-join
        // BEFORE any shingling, and the two attach joins run over that
        // candidate-sized set. One extra corpus scan total, shingling paid
        // only for candidates (guide §2.3: decide on small rows, compute
        // heavy derivations once).
        val pr = pairs.localCheckpoint(eager = false)
        val ids = pr.select(col("id_a").as("__cid"))
          .union(pr.select(col("id_b").as("__cid"))).distinct()
        val sh = docs
          .join(broadcast(ids), col(idCol) === col("__cid"), "left_semi")
          .select(col(idCol).as("id"),
            array_distinct(shingles(col(textCol), p.shingleWords)).as("sh"))
          // checkpointed too: it feeds BOTH attach joins — materialized once
          // (one corpus scan), read twice at candidate size
          .localCheckpoint(eager = false)
        pr
          .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
          .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
          .withColumn("jaccard", col("inter").cast("double") / col("uni"))
          .filter(col("jaccard") >= threshold)
          .select(col("id_a"), col("id_b"), col("jaccard"))
    }
  }
}
