package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("v")).collect()(0).get(0)

  test("token counting: whitespace and BPE-ish") {
    assert(one("  hello   world ", TextAnalysis.tokenCount(col("text"))) === 2)
    assert(one("", TextAnalysis.tokenCount(col("text"))) === 0)
    // ab1 c! → [ab][1][c][!] = 4 BPE-ish pieces
    assert(one("ab1 c!", TextAnalysis.bpeishCount(col("text"))) === 4)
  }

  test("language ID: marker-word argmax with deterministic tie-break") {
    assert(one("the cat is on the mat", TextAnalysis.langGuess(col("text"))) === "en")
    assert(one("el perro que la casa es", TextAnalysis.langGuess(col("text"))) === "es")
    assert(one("der hund ist und das", TextAnalysis.langGuess(col("text"))) === "de")
    assert(one("xyzzy plugh quux", TextAnalysis.langGuess(col("text"))) === "und")
    // 'la' is in both es and fr lists; es wins the tie (earlier in code order)
    assert(one("la la la", TextAnalysis.langGuess(col("text"))) === "es")
  }

  test("quality features: handcrafted values") {
    val r = TextAnalysis.qualityFeatures(Seq((1L, "the quick fox, it is!")).toDF("doc_id", "text"))
      .collect()(0)
    assert(r.getAs[Int]("n_tokens") === 5)
    assert(r.getAs[Int]("punct_cnt") === 2) // comma + bang
    assert(r.getAs[Int]("stopword_kinds") === 1) // only "the" ("is!" ≠ "is")
    // 21 bytes / 5 tokens * 100 = 420
    assert(r.getAs[Long]("avg_token_len") === 420L)
    // 5/200*500 + 1/5*500 = 12.5 + 100 → floor 112
    assert(r.getAs[Long]("quality_score") === 112L)
  }

  test("fingerprint: whitespace/case-insensitive, order-sensitive, collision-free here") {
    val fps = Seq(
      (1L, "Hello   World"), (2L, "hello world"),
      (3L, "world hello"), (4L, "something else"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
    assert(fps(1L) !== fps(4L))
  }
}
