package graft

import graft.dedup.SetSimJoin
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Prefix-filtered exact set-similarity join: completeness+exactness law
  * against the naive all-pairs join on random near-dup corpora, candidate
  * pruning effectiveness, threshold boundary (ties at exactly t), and
  * determinism across partitionings. */
class SetSimJoinSpec extends SparkSpec {

  import spark.implicits._

  /** Naive reference: all-pairs exact Jaccard over distinct n-gram sets. */
  private def ref(texts: Map[Long, String], n: Int,
      tMilli: Long): Map[(Long, Long), Long] = {
    def shingleSet(t: String): Set[String] = {
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (ws.isEmpty) Set("")
      else if (ws.size < n) Set(ws.mkString(" "))
      else ws.sliding(n).map(_.mkString(" ")).toSet
    }
    val sets = texts.map { case (id, t) => id -> shingleSet(t) }
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      uni = sa.size + sb.size - inter
      if inter * 1000 >= tMilli * uni
    } yield (a, b) -> inter * 1000 / uni).toMap
  }

  private val vocab = Vector("red", "green", "blue", "cyan", "teal", "gray",
    "pink", "aqua", "plum", "sand")

  /** Corpus of random docs where some are near-copies of earlier ones. */
  private def corpus(seed: Long, nDocs: Int): Map[Long, String] = {
    val g = Gen.choose(8, 25).flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab)))
    (0L until nDocs).map { i =>
      val words = g(Gen.Parameters.default, Seed(seed * 1000 + i)).get.toVector
      if (i % 4 == 3) {
        // near-copy of doc i-3 with one word changed
        val base = g(Gen.Parameters.default, Seed(seed * 1000 + i - 3)).get.toVector
        i -> base.updated(base.size / 2, "swapped").mkString(" ")
      } else i -> words.mkString(" ")
    }.toMap
  }

  test("law: equals the naive all-pairs join on random near-dup corpora") {
    for (seed <- 1L to 3L) {
      val texts = corpus(seed, 40)
      val df = texts.toSeq.toDF("doc_id", "text").repartition(8)
      for (tMilli <- Seq(300L, 600L)) {
        val got = SetSimJoin.jaccardPairs(df, "doc_id", "text", n = 3, tMilli)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
        assert(got === ref(texts, 3, tMilli), s"seed=$seed t=$tMilli")
      }
    }
  }

  test("threshold boundary: a pair at exactly t is kept (>= not >)") {
    // sets {a b c d} vs {a b c e} as 1-grams: inter 3, union 5 -> 600 milli
    val df = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val at = SetSimJoin.jaccardPairs(df, "doc_id", "text", n = 1, tMilli = 600)
      .collect()
    assert(at.length === 1 && at.head.getLong(4) === 600L)
    assert(SetSimJoin.jaccardPairs(df, "doc_id", "text", 1, 601).collect().isEmpty)
  }

  test("prefix filter prunes: candidates stay far below all-pairs on a dup-sparse corpus") {
    // 120 docs, mostly unique trigram sets; count verified OUTPUT pairs vs
    // the theoretical all-pairs volume as a coarse effectiveness signal,
    // and assert the planted near-dups are all found
    val texts = corpus(7L, 120)
    val df = texts.toSeq.toDF("doc_id", "text").repartition(8)
    val got = SetSimJoin.jaccardPairs(df, "doc_id", "text", 3, 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = ref(texts, 3, 500).keySet
    assert(got === want)
    assert(got.nonEmpty, "planted near-copies must qualify at t=0.5")
    assert(got.size < 120L * 119 / 20, "output must be pair-sparse")
  }

  test("deterministic across partitionings") {
    val texts = corpus(11L, 60)
    def run(parts: Int) = SetSimJoin.jaccardPairs(
      texts.toSeq.toDF("doc_id", "text").repartition(parts),
      "doc_id", "text", 3, 400)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).sorted.toSeq
    assert(run(2) === run(17))
  }
}
