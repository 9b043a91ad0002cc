package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.WordShinglesFunctions.word_shingles

/** EXACT set-similarity self-join via prefix filtering (the AllPairs /
  * PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08) — closes the
  * dedup family's guarantee spectrum: hash equality (exact duplicates) →
  * MinHash-LSH / SimHash (probabilistic near-dups, tunable recall) → THIS
  * (every pair with Jaccard ≥ t, no false negatives, no sampling error).
  *
  * Why it scales without LSH's recall trade: order every set's tokens by
  * GLOBAL frequency, rarest first. If J(x,y) ≥ t, the sets must overlap so
  * much that they share a token within each one's first
  * `|s| − ⌈t·|s|⌉ + 1` tokens (the prefix) — so joining only the prefixes
  * on token finds every qualifying pair. Rare tokens lead the prefixes,
  * hot tokens sink to suffixes and never join: candidate volume tracks the
  * rare end of the token distribution, not n². A length filter
  * (`min·1000 ≥ t·max`) prunes size-incompatible pairs inside the join,
  * and exact verification (one `array_intersect` per candidate) keeps only
  * true matches.
  *
  * Thresholds are integer milli (`tMilli`/1000 = t exactly): the prefix
  * length uses exact integer ceil, verification compares
  * `inter·1000 ≥ tMilli·union` — no doubles anywhere, so the result is
  * reshuffle-deterministic and a naive-join oracle hash-matches.
  *
  * Shuffle shape: one token-df aggregation, one rank window per set id,
  * the prefix-token self-join (the data-sized exchange — carries (token,
  * id, size), never text), and two id joins to fetch sets for the ≤
  * candidate-count verifications. */
object SetSimJoin {

  /** All pairs (id_a < id_b) of documents whose distinct `n`-gram shingle
    * sets have Jaccard ≥ tMilli/1000: (id_a, id_b, inter, uni,
    * jaccard_milli). Empty-text docs shingle to [""] (the
    * [[graft.functions.WordShingles]] contract) and participate. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, tMilli: Long): DataFrame = {
    require(tMilli >= 1 && tMilli <= 1000, s"tMilli out of range: $tMilli")
    // lazy localCheckpoint: the final plan references `sets` FOUR times
    // (token df, prefix ranking, both verification joins) — unchecked,
    // each reference re-scans and re-shingles the full corpus, and
    // shingling dominates at corpus scale (the Components lesson)
    val sets = docs.select(col(idCol).as("id"),
        array_sort(array_distinct(word_shingles(col(textCol), n))).as("st"))
      .withColumn("sz", size(col("st")))
      .localCheckpoint(eager = false)
    val tokDf = sets.select(explode(col("st")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tdf"))
    val ranked = sets.select(col("id"), col("sz"), explode(col("st")).as("tok"))
      .join(tokDf, "tok")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("tdf"), col("tok"))))
    // prefix length |s| - ceil(t*|s|) + 1, exact integer ceil
    val prefixes = ranked
      .filter(col("r") <= expr(s"sz - ((sz * ${tMilli}L + 999L) div 1000L) + 1L"))
      .select(col("tok"), col("id"), col("sz"))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          // 1000L: int-typed `sz * 1000` wraps past ~2.1M distinct shingles
          // and a wrapped negative product would silently DROP a qualifying
          // pair — the exact false negative this module promises not to have
          least(col("a.sz"), col("b.sz")) * lit(1000L) >=
            greatest(col("a.sz"), col("b.sz")) * lit(tMilli))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("st").as("st_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("st").as("st_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("st_a"), col("st_b"))).cast("long"))
      .withColumn("uni",
        size(col("st_a")).cast("long") + size(col("st_b")) - col("inter"))
      .filter(col("inter") * 1000 >= lit(tMilli) * col("uni"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        expr("inter * 1000L div uni").as("jaccard_milli"))
  }
}
