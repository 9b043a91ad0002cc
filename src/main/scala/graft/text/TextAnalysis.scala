package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation over the documents
  * table: language ID, quality scoring, token counting, fingerprinting.
  * Built-ins only — everything stays in whole-stage codegen.
  */
object TextAnalysis {

  // -- tokenization ---------------------------------------------------------

  /** Non-empty whitespace-separated tokens. DuckDB twin:
    * list_filter(string_split_regex(text, '\s+'), t -> t <> ''). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-space symbols — a standard cheap proxy for tokenizer load. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  // -- language ID ----------------------------------------------------------

  /** Tiny per-language marker lexicons (function-word heuristics). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  /** Heuristic n-gram/function-word language guess: argmax of marker hits,
    * deterministic tie-break by language code order, 'und' when no marker
    * hits at all. */
  def langGuess(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = LangMarkers.map { case (lang, markers) =>
      (lang, size(array_intersect(toks, array(markers.map(lit): _*))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  // -- quality scoring ------------------------------------------------------

  /** Length / punctuation / stopword-ratio quality features + a composite
    * score in [0, 1000] (bigint, for exact cross-engine comparison). */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nChar = octet_length(t)
    val punct = size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0)))
    val stop = size(array_intersect(tokens(lower(t)),
      array(Seq("the", "a", "of", "and", "to", "in", "is").map(lit): _*)))
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("n_bytes", nChar)
      .withColumn("punct_cnt", punct)
      .withColumn("stopword_kinds", stop)
      .withColumn("avg_token_len",
        floor(nChar.cast("double") / greatest(nTok, lit(1)) * 100).cast("long"))
      // composite: reward moderate length + stopword presence, punish extremes
      .withColumn("quality_score",
        floor(
          least(nTok, lit(200)).cast("double") / 200 * 500 +
            least(col("stopword_kinds"), lit(5)).cast("double") / 5 * 500
        ).cast("long"))
  }

  // -- scrubbing ------------------------------------------------------------

  /** PII/URL scrubbing for training-data curation: emails, URLs and long
    * digit runs replaced with typed placeholder tokens. Pure regexp_replace
    * (codegen'd); patterns kept RE2-compatible for the DuckDB oracle twin. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val LongDigitPattern = "[0-9]{7,}"

  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      LongDigitPattern, "<NUM>")

  // -- fingerprinting -------------------------------------------------------

  /** Polynomial rolling hash over the normalized token stream (deterministic
    * document fingerprint). Modulus 2^56-5 (prime) keeps acc*31 + h < 2^63
    * so the ANSI-mode multiply can't overflow. */
  def fingerprint(text: Column): Column = {
    val M = lit(72057594037927931L) // 2^56 - 5
    aggregate(
      filter(split(regexp_replace(trim(lower(text)), "\\s+", " "), " "), t => t =!= ""),
      lit(0L),
      (acc, tok) => pmod(acc * 31 + pmod(xxhash64(tok), M), M))
  }
}
