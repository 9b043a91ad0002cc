package graft

import graft.text.TextAnalysis

/** Token entropy: reference-model equality, the constant/uniform poles,
  * repetitive-vs-diverse ordering, empty-doc exclusion and partitioning
  * determinism. */
class TokenEntropySpec extends SparkSpec {

  import spark.implicits._

  private def ref(text: String): Option[(Long, Long)] = {
    val ws = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (ws.isEmpty) None
    else {
      val n = ws.size.toLong
      val h = ws.groupBy(identity).values.map { g =>
        val c = g.size.toLong
        math.floor(1000000.0 * (c.toDouble / n) *
          math.log(n / c.toDouble)).toLong
      }.sum
      Some((n, h))
    }
  }

  private def run(texts: Seq[(Long, String)], parts: Int = 4) =
    TextAnalysis.tokenEntropy(texts.toDF("doc_id", "text").repartition(parts))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("matches the sequential reference model term-for-term") {
    val texts = Seq(
      (1L, "a a a a"),                    // constant: H = 0 exactly
      (2L, "a b c d"),                    // uniform: H = ln 4
      (3L, "the the the cat sat on the mat"),
      (4L, "x"),
      (5L, "  "))                         // no tokens: absent
    val got = run(texts)
    val want = texts.flatMap { case (id, t) => ref(t).map(id -> _) }.toMap
    assert(got === want)
    assert(got(1L)._2 === 0L)
    // uniform 4 tokens: ln 4 in micro-nats, floor per equal term
    assert(math.abs(got(2L)._2 - 1386294L) <= 4L)
    assert(!got.contains(5L), "token-free docs have no distribution")
  }

  test("repetitive text scores below diverse text of the same length") {
    val got = run(Seq(
      (1L, Seq.fill(20)("spam").mkString(" ")),
      (2L, (1 to 20).map(i => s"w$i").mkString(" "))))
    assert(got(1L)._2 === 0L)
    assert(got(2L)._2 > 2900000L, s"20 distinct tokens ~ ln20: ${got(2L)}")
  }

  test("bit-identical across partitionings") {
    val texts = (0L until 100L).map(i =>
      (i, (0 to (i % 17).toInt).map(j => s"t${j % 5}").mkString(" ")))
    assert(run(texts, 2) === run(texts, 13))
  }
}
