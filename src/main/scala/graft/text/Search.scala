package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text search primitives over the documents table: a relational
  * inverted index (term postings with df cutoffs) and BM25 ranked retrieval.
  * The search-engine ingest/query pair a log platform bolts on next to its
  * analytics (the reference ships raw events to a hosted search backend —
  * `/root/reference/source/sender/sender.go` — this is the self-hosted
  * analog's core).
  *
  * Postings are RELATIONAL (one row per (term, doc)) rather than
  * array-packed: at corpus scale a posting list for a frequent term is
  * millions of entries — a single array cell would concentrate a term's
  * whole list in one task (the same reason [[graft.dedup.MinHashLSH]] keeps
  * band buckets exploded). Rows shuffle, balance and join; arrays don't.
  *
  * Shuffle shape: tf = groupBy(term, doc) hashes BOTH keys — balanced under
  * zipfian terms (a by-term-only layout would hand one task the full
  * stopword share of the corpus); df rides a window over the already
  * tf-aggregated rows (distinct (term, doc) pairs, orders of magnitude
  * smaller than token occurrences).
  *
  * BM25 is two passes, zero data-sized shuffles: one scalar aggregate for
  * (N, Σdl, df per query term), one scoring scan + top-k
  * (TakeOrderedAndProject — per-partition heaps, never a full sort). Scores
  * are integer milli-points: each per-term contribution is floor-scaled to
  * a bigint PER ROW and contributions are added as integer COLUMNS, so no
  * double ever crosses rows — rankings are reshuffle-deterministic and a
  * DuckDB oracle hash-matches (ties broken by doc id). Ad-hoc queries score
  * by scan; a standing query set at scale joins [[postings]] instead.
  */
object Search {

  /** Lowercased whitespace tokens — [[TextAnalysis.tokens]]' convention.
    * DuckDB twin: `list_filter(string_split_regex(lower(text), '\s+'),
    * t -> t <> '')`. */
  private def toks(textCol: String) =
    TextAnalysis.tokens(lower(col(textCol)))

  /** The inverted index as rows: (term, doc_id, tf, df) for every term with
    * `minDf <= df` and `df·100 <= maxDfPercent·N` (integer-exact ratio — the
    * stopword cutoff; terms in ~every document carry no signal and dominate
    * index size). */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDfPercent: Int): DataFrame = {
    require(minDf >= 1, s"minDf out of range: $minDf")
    require(maxDfPercent >= 1 && maxDfPercent <= 100,
      s"maxDfPercent out of range: $maxDfPercent")
    val n = docs.select(count(lit(1)).as("n"))
    docs.select(col(idCol).as("doc_id"), explode(toks(textCol)).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .filter(col("df") >= minDf && col("df") * 100 <= col("n") * maxDfPercent)
      .select(col("term"), col("doc_id"), col("tf"), col("df"))
  }

  /** Corpus statistics BM25 needs: document count, total token count, and
    * per-query-term document frequency — ONE scalar aggregate pass. */
  final case class Bm25Stats(n: Long, sumDl: Long, df: Map[String, Long])

  def bm25Stats(docs: DataFrame, textCol: String,
      terms: Seq[String]): Bm25Stats = {
    require(terms.nonEmpty, "give at least one query term")
    val t = toks(textCol)
    val aggs = sum(size(t).cast("long")).as("sum_dl") +:
      terms.zipWithIndex.map { case (q, i) =>
        sum(when(array_contains(t, q), 1L).otherwise(0L)).as(s"df_$i")
      }
    val row = docs.agg(count(lit(1)).as("n"), aggs: _*).collect().head
    Bm25Stats(row.getAs[Long]("n"), row.getAs[Long]("sum_dl"),
      terms.zipWithIndex.map { case (q, i) => q -> row.getAs[Long](s"df_$i") }.toMap)
  }

  /** Top-`k` documents for `terms` under BM25 (Robertson idf with the +1
    * floor, so common terms score ≥ 0). Output: (doc_id, score_milli),
    * ordered score-desc then doc_id. The per-term contribution
    *
    *   floor(1000 · ln((N − df + ½)/(df + ½) + 1) · tf·(k1+1)
    *         / (tf + k1·(1 − b + b·dl/avgdl)))
    *
    * is a bigint per (doc, term) computed on the doc's own row; the score is
    * the integer SUM OF COLUMNS — no double leaves its row. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    val st = bm25Stats(docs, textCol, terms)
    val avgdl = st.sumDl.toDouble / st.n
    val base = docs.select(col(idCol).as("doc_id"), toks(textCol).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
    val contribs = terms.map { q =>
      val dfq = st.df(q)
      // idf is a scalar: pre-folded here with the same IEEE ops an engine
      // folding the literal expression performs
      val preIdf = 1000.0 * math.log(
        ((st.n - dfq).toDouble + 0.5) / (dfq.toDouble + 0.5) + 1)
      val tf = size(filter(col("__toks"), x => x === q)).cast("long")
      floor(lit(preIdf) * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / lit(avgdl))))
        .cast("long")
    }
    base.withColumn("score_milli", contribs.reduce(_ + _))
      .orderBy(col("score_milli").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score_milli"))
  }
}
