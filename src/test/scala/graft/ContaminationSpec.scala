package graft

import graft.text.Contamination

/** Contamination scores: exact hand-computed coverage, full-containment and
  * zero-overlap poles, distinct-shingle counting, the short-doc whole-text
  * contract, and null-text exclusion. */
class ContaminationSpec extends SparkSpec {

  import spark.implicits._

  private def run(train: Seq[(Long, String)], test: Seq[(Long, String)],
      n: Int = 3) =
    Contamination.overlap(
      train.toDF("doc_id", "text"), test.toDF("doc_id", "text"),
      "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("exact coverage: matched/total distinct trigrams, floor milli") {
    val train = Seq((1L, "a b c d e")) // trigrams: abc bcd cde
    val test = Seq(
      (10L, "a b c d e"),   // 3/3 matched -> 1000
      (11L, "a b c x y z"), // trigrams abc bcx cxy xyz: 1/4 -> 250
      (12L, "p q r s"))     // 0/2 -> 0
    val got = run(train, test)
    assert(got === Map(
      10L -> ((3L, 3L, 1000L)),
      11L -> ((4L, 1L, 250L)),
      12L -> ((2L, 0L, 0L))))
  }

  test("repeated shingles count once on both sides (coverage, not frequency)") {
    val got = run(
      train = Seq((1L, "x y z x y z x y z")),
      test = Seq((10L, "x y z x y z")))
    // test trigrams: xyz yzx zxy xyz -> 3 DISTINCT, all in train
    assert(got(10L) === ((3L, 3L, 1000L)))
  }

  test("short docs contribute their whole text as one shingle") {
    val got = run(
      train = Seq((1L, "tiny doc"), (2L, "a b c d")),
      test = Seq((10L, "tiny doc"), (11L, "other words")))
    assert(got(10L) === ((1L, 1L, 1000L)), "whole-text shingle must match")
    assert(got(11L) === ((1L, 0L, 0L)))
  }

  test("null-text docs are absent; case and whitespace runs normalize") {
    val train = Seq((1L, "A  B\tC")).toDF("doc_id", "text")
    val test = Seq((10L, Some("a b c")), (11L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Contamination.overlap(train, test, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(10L -> 1000L), s"got $got")
  }
}
