package graft

import graft.text.Collocations

/** PMI collocations: exact match vs a sequential reference model, the
  * association ordering (a locked phrase outscores an incidental pair),
  * minCount cutoff, and short-doc bigram exclusion. */
class CollocationsSpec extends SparkSpec {

  import spark.implicits._

  private def ref(texts: Seq[String], minCount: Long): Map[(String, String), (Long, Long)] = {
    val toks = texts.map(_.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq)
    val unis = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val bis = toks.filter(_.size >= 2).flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= minCount)
    val nUni = toks.map(_.size.toLong).sum.toDouble
    val nBig = toks.map(t => math.max(t.size - 1, 0).toLong).sum.toDouble
    bis.map { case ((a, b), cab) =>
      (a, b) -> (cab, math.floor(1000.0 * math.log(
        (cab / nBig) / ((unis(a) / nUni) * (unis(b) / nUni)))).toLong)
    }
  }

  private def run(texts: Seq[String], minCount: Long) =
    Collocations.pmi(texts.toDF("text"), "text", minCount)
      .collect()
      .map(r => (r.getString(1), r.getString(0)) -> (r.getLong(2), r.getLong(3)))
      .toMap // note: select order is (w1, w2, ...) — see assertion below

  test("exact match vs the sequential reference model") {
    // 'new york': parts occur ONLY together; 'is'/'big' each appear 4x but
    // adjacent only twice — the locked phrase must win on association
    val texts = Seq(
      "new york is big", "new york never sleeps",
      "the big apple is the apple", "big data is the thing",
      "the apple is big")
    val got = Collocations.pmi(texts.toDF("text"), "text", 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === ref(texts, 1))
    assert(got(("new", "york"))._2 > got(("is", "big"))._2)
    // frequent parts, rare adjacency -> negative PMI
    val neg = Collocations.pmi(Seq("b a a a a a a b").toDF("text"), "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(neg(("a", "b")) < 0, s"got $neg")
  }

  test("minCount cutoff and short-doc exclusion") {
    val texts = Seq("a b", "a b", "a b", "c d", "x")
    val got = Collocations.pmi(texts.toDF("text"), "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b")), s"got $got")
    // the single-token doc contributed its unigram (x) but no bigram — its
    // absence from pairs is structural; ref model equality pins the totals
    assert(Collocations.pmi(texts.toDF("text"), "text", 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap === ref(texts, 1))
  }
}
