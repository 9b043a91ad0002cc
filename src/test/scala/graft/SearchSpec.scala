package graft

import graft.text.Search
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Inverted-index postings (exact tf/df, both df cutoffs, cross-partition
  * df) and BM25 retrieval (exact match against a sequential reference model,
  * idf ordering, tf saturation, tie-break determinism). */
class SearchSpec extends SparkSpec {

  import spark.implicits._

  test("postings: exact tf/df with minDf and maxDf stopword cutoffs") {
    val docs = Seq(
      (1L, "apple banana apple common"),
      (2L, "banana cherry common"),
      (3L, "apple common"),
      (4L, "durian common")).toDF("doc_id", "text")
    val got = Search.postings(docs, "doc_id", "text", minDf = 2, maxDfPercent = 75)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    // cherry/durian pruned by minDf=2; common (df=4 of 4) pruned by maxDf 75%
    assert(got === Seq(
      ("apple", 1L, 2L, 2L), ("apple", 3L, 1L, 2L),
      ("banana", 1L, 1L, 2L), ("banana", 2L, 1L, 2L)))
  }

  test("postings: case folding and whitespace-run tokenization") {
    val docs = Seq((1L, "Apple  BANANA\napple\t apple")).toDF("doc_id", "text")
    val got = Search.postings(docs, "doc_id", "text", minDf = 1, maxDfPercent = 100)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("apple" -> 3L, "banana" -> 1L))
  }

  test("postings: df is corpus-global across partitions") {
    val docs = (0 until 200).map(i =>
      (i.toLong, if (i % 3 == 0) "x y" else "y z")).toDF("doc_id", "text")
      .repartition(16)
    val dfs = Search.postings(docs, "doc_id", "text", minDf = 1, maxDfPercent = 100)
      .select("term", "df").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfs === Map("x" -> 67L, "y" -> 200L, "z" -> 133L))
  }

  private def refScores(corpus: Seq[(Long, Seq[String])], terms: Seq[String],
      k1: Double, b: Double): Map[Long, Long] = {
    val n = corpus.size.toLong
    val sumDl = corpus.map(_._2.size.toLong).sum
    val avgdl = sumDl.toDouble / n
    val df = terms.map(t => t -> corpus.count(_._2.contains(t)).toLong).toMap
    corpus.map { case (id, ws) =>
      val dl = ws.size.toLong
      id -> terms.map { t =>
        val preIdf = 1000.0 * math.log(
          ((n - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5) + 1)
        val tf = ws.count(_ == t).toLong
        math.floor(preIdf * (tf * (k1 + 1)) /
          (tf + k1 * ((1 - b) + b * dl / avgdl))).toLong
      }.sum
    }.toMap
  }

  test("bm25: exact integer scores match the sequential reference model") {
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "gray", "pink")
    val docGen = Gen.choose(3, 20).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)))
    val corpus = (0 until 60).map { i =>
      i.toLong -> docGen(Gen.Parameters.default, Seed(i.toLong)).get.toSeq
    }
    val docs = corpus.map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text").repartition(8)
    val terms = Seq("red", "cyan")
    val got = Search.bm25TopK(docs, "doc_id", "text", terms, k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = refScores(corpus, terms, k1 = 1.2, b = 0.75)
    for ((id, s) <- got) assert(s === want(id), s"doc $id")
    // full ranking: score desc, doc_id asc — deterministic under ties
    val expectedOrder = want.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(got.map(_._1).toSeq === expectedOrder)
  }

  test("postings: no window operator in the plan (df straggler regression pin)") {
    // the round-6 plan attached df with count() over (partition by term) —
    // every (term, doc) row of a stopword re-shuffled to ONE reducer before
    // the cutoff could drop it. df is now a map-side-combinable aggregate
    // attached via broadcast; a Window reappearing here is the regression.
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = Search.postings(docs, "doc_id", "text", minDf = 1, maxDfPercent = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"postings plan regained a window:\n$plan")
  }

  test("term_counts kernel: identical counts to the per-term HOF filter form") {
    val docs = Seq(
      (1L, "a b a c a"), (2L, ""), (3L, "c c b"), (4L, "zz a zz")).toDF("doc_id", "text")
    val toks = graft.text.TextAnalysis.tokens(lower(col("text")))
    val terms = Seq("a", "b", "zz", "absent")
    val kernel = docs.select(col("doc_id"),
      graft.functions.TermCountsFunctions.term_counts(toks, terms).as("tc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = docs.select(col("doc_id") +: terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === t)).cast("long").as(s"c$i") }: _*)
      .collect().map(r => r.getLong(0) -> terms.indices.map(i => r.getLong(i + 1))).toMap
    assert(kernel === hof)
  }

  test("bm25: rare terms outweigh common ones; tf saturates under k1") {
    val docs = (Seq(
      (1L, "rare filler filler filler"),
      (2L, "common filler filler filler"),
      (3L, "rare rare rare rare"),
      (4L, "rare filler filler filler")) ++
      (5L to 20L).map(i => (i, "common filler filler filler"))).toDF("doc_id", "text")
    val scores = Search.bm25TopK(docs, "doc_id", "text",
        Seq("rare", "common"), k = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(1L) > scores(2L),
      "one rare-term hit must outscore one common-term hit at equal tf/dl")
    // tf=4 of a term scores well under 4x its tf=1 score (BM25 saturation)
    assert(scores(3L) < 4 * scores(1L) && scores(3L) > scores(1L))
    // docs with zero query terms score exactly 0
    val zero = Search.bm25TopK(docs, "doc_id", "text", Seq("absent"), k = 20)
      .collect().map(_.getLong(1)).toSet
    assert(zero === Set(0L))
  }
}
