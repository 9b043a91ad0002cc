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

  // -- repetition / boilerplate signals -------------------------------------

  /** Gopher/MassiveText-style repetition signals, in exact integer basis
    * points (cross-engine comparable — the mirrored double expression orders
    * identically under IEEE-754 in Spark and DuckDB): fraction of duplicate
    * tokens and of duplicate non-empty lines. High values mark boilerplate /
    * template spam for the curation gate. */
  def repetitionFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def dupBp(arr: Column): Column = {
      val n = size(arr)
      when(n === 0, lit(0L)).otherwise(
        floor((lit(1.0) - size(array_distinct(arr)).cast("double") / n) * 10000)
          .cast("long"))
    }
    val toks = tokens(lower(t))
    val lines = filter(transform(split(t, "\n"), l => trim(l)), l => l =!= "")
    docs
      .withColumn("dup_token_bp", dupBp(toks))
      .withColumn("dup_line_bp", dupBp(lines))
  }

  // -- deterministic sampling / dataset splits ------------------------------

  /** Portable deterministic hash bucket: the first 4 hex chars of
    * md5(salt ‖ key). Fixed-width lowercase hex sorts numerically under
    * plain string comparison and md5 is bit-identical in every engine, so
    * split membership is stable across engines, reruns and cluster sizes —
    * the standard trick for reproducible train/valid splits at corpus scale
    * (no RNG state, no shuffle, no sampleBy seed drift; 65536 buckets). */
  def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 4)

  /** Deterministic train/valid split: `validHexThreshold` is the exclusive
    * upper hex bound of the valid bucket range — "2000" ⇒ 0x2000/0x10000 =
    * 12.5 % of keys land in valid, forever, on any engine. */
  def datasetSplit(key: Column, salt: String = "split",
      validHexThreshold: String = "2000"): Column =
    when(hashBucket(key, salt) < lit(validHexThreshold), lit("valid"))
      .otherwise(lit("train"))

  /** Deterministic stratified downsampling to a target corpus mix: each
    * stratum (language, domain, source…) keeps documents whose portable md5
    * hash bucket ([[hashBucket]]) falls below the stratum's rate threshold
    * (rate × 65536, rendered as the 4-hex-char exclusive upper bound).
    * Strata absent from `rates` use `defaultRate`.
    *
    * No RNG state, no shuffle, no `sampleBy` seed drift: the verdict is a
    * pure projection of (key, stratum), so the kept set is identical on any
    * engine, cluster size or rerun, and stable under incremental
    * re-ingestion — a document's verdict never changes when its neighbors
    * do. This is the standard rebalancing step for a web corpus's
    * language/domain mix. `stratumCol` must already exist (compute it
    * upstream — keeps an expensive classifier out of the filter
    * expression). */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix", keyCol: String = "doc_id"): DataFrame = {
    require(rates.nonEmpty, "stratifiedSample needs at least one stratum rate")
    val bucket = hashBucket(col(keyCol), salt)
    def keepFor(rate: Double): Column = {
      // clamp on the ROUNDED threshold: a rate like 0.999999 rounds to
      // 65536, whose "%04x" would be the 5-char "10000" — lexicographically
      // SMALLER than most 4-char buckets, silently keeping ~6% instead of
      // ~100%
      val t = math.round(rate * 65536)
      if (t >= 65536L) lit(true)
      else if (t <= 0L) lit(false)
      else bucket < lit(f"$t%04x")
    }
    val ordered = rates.toSeq.sortBy(_._1)
    val chain = ordered.tail.foldLeft(
      when(col(stratumCol) === ordered.head._1, keepFor(ordered.head._2))) {
      case (c, (s, r)) => c.when(col(stratumCol) === s, keepFor(r))
    }
    docs.filter(chain.otherwise(keepFor(defaultRate)))
  }

  // -- corpus-frequency unit stripping ---------------------------------------

  /** Corpus-frequency unit stripping — one operator, two classic curation
    * modes by separator:
    *  - `sep = "\n"`: C4-style boilerplate LINE removal — any trimmed
    *    non-empty line occurring in ≥ `minDf` distinct documents (cookie
    *    banners, nav bars, license headers) is stripped from every document;
    *  - `sep = " "`: document-frequency stopword stripping (index building,
    *    rare-token analysis).
    * Documents are rebuilt from their surviving units in original order; a
    * document whose every unit was hot disappears (C4 drops emptied docs the
    * same way).
    *
    * Shape: posexplode → distinct-per-doc df aggregation (map-side combined;
    * the shuffle carries (unit, doc_id), never documents) → anti-join
    * against the hot set → per-doc ordered reassembly keyed by doc_id.
    * The hot set is broadcast only after a guarded count: "frequent units
    * are few by construction" holds for sane `minDf`, but a tiny `minDf`
    * makes the hot set corpus-sized and an unconditional `broadcast()`
    * would OOM the driver — above `maxBroadcastUnits` the anti-join runs
    * shuffled instead (same rows, bigger exchange, no driver risk). The
    * hot set is materialized ONCE via an eager localCheckpoint (spills to
    * disk) so the guard count and the join share one computation; unlike
    * `persist()`, checkpoint blocks are freed by the ContextCleaner when
    * the returned plan is dropped — no CacheManager entry to leak per
    * call. The guard makes this builder run one Spark job eagerly (the
    * price of choosing the join strategy from data). At 100 TB the unit
    * key would be xxhash64(unit) (8 bytes); the string key is kept so
    * DuckDB twins the pipeline exactly. */
  def stripFrequentUnits(docs: DataFrame, minDf: Int, sep: String = "\n",
      idCol: String = "doc_id", textCol: String = "text",
      maxBroadcastUnits: Long = 1000000L): DataFrame = {
    val units = docs.select(col(idCol).as("doc_id"),
      posexplode_outer(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "unit")))
    val hot = units.filter(trim(col("unit")) =!= "")
      .select(col("doc_id"), trim(col("unit")).as("u")).distinct()
      .groupBy(col("u")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("u"))
      .localCheckpoint()
    // limit(max+1): the guard needs only "over the threshold?", never the
    // full count — the scan stops as soon as the answer is known
    val overCap = hot.limit(math.min(maxBroadcastUnits + 1, Int.MaxValue.toLong).toInt)
      .count() > maxBroadcastUnits
    val hotSide = if (overCap) hot else broadcast(hot)
    units.join(hotSide, trim(units("unit")) === hot("u"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("unit")))),
          x => x.getField("unit")), sep).as("clean_text"))
  }

  // -- substring-level duplication ------------------------------------------

  /** Substring-level duplication measure — the fixed-granularity form of
    * suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"): a w-word gram occurring in ≥ 2
    * DISTINCT documents marks every token position it covers as duplicated;
    * per document the output is the exact count and basis-point fraction of
    * duplicated positions — the signal used to cut repeated spans (licenses,
    * templates, mirrored passages) out of a corpus. Within-document
    * repetition alone does NOT mark (df is over distinct docs; that signal
    * is [[repetitionFeatures]]).
    *
    * Shape: pos-indexed gram explode → distinct-per-doc df agg → equi-join
    * back on the gram → span explode (w rows per hit) → per-doc distinct
    * position count. Shuffles carry (gram, doc_id) and (doc_id, pos) pairs,
    * never text. At 100 TB the gram key would be xxhash64 (8 bytes); the
    * string key is kept so DuckDB twins the pipeline exactly. */
  def duplicatedSpans(docs: DataFrame, w: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).as("n_tokens"),
      posexplode_outer(graft.dedup.MinHashLSH.shingles(col(textCol), w))
        .as(Seq("pos", "gram")))
    val dup = grams.select(col("doc_id"), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("gram"))
    val covered = grams.join(dup, "gram")
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("tok"))
      .filter(col("tok") < col("n_tokens")) // short-doc gram covers n_tokens only
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("tok")).as("dup_tokens"))
    docs.select(col(idCol).as("doc_id"), tokenCount(col(textCol)).as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn("dup_span_bp",
        when(col("n_tokens") === 0, lit(0L)).otherwise(
          floor(col("dup_tokens").cast("double") / col("n_tokens") * 10000)
            .cast("long")))
  }

  // -- train/valid contamination scan ---------------------------------------

  /** Split-leakage (contamination) scan: pairs of (train doc, valid doc)
    * sharing at least one rare word n-gram, with the count of distinct
    * shared n-grams — the standard pre-training hygiene check (GPT-3 used
    * 13-gram overlap; the n is a parameter). Shape: an inverted-index
    * equi-join on the shingle, with a document-frequency cap dropping
    * boilerplate shingles the same way posting lists are capped — without it
    * one hot n-gram would generate a quadratic bucket. At the 100 TB design
    * point the join key would be xxhash64(shingle) (8 bytes, collision-
    * counted); the string key is kept here so DuckDB can twin the whole
    * pipeline exactly. */
  def splitContamination(docs: DataFrame, shingleWords: Int = 5,
      maxShingleDf: Int = 64, salt: String = "split",
      validHexThreshold: String = "2000",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      (hashBucket(col(idCol), salt) < lit(validHexThreshold)).as("is_valid"),
      explode_outer(array_distinct(
        graft.dedup.MinHashLSH.shingles(col(textCol), shingleWords))).as("sh"))
    // df over distinct-per-doc shingles == number of docs containing it
    val rare = base.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf).select("sh")
    val g = base.join(rare, "sh")
    val t = g.filter(!col("is_valid")).select(col("doc_id").as("train_id"), col("sh"))
    val v = g.filter(col("is_valid")).select(col("doc_id").as("valid_id"), col("sh"))
    t.join(v, "sh")
      .groupBy(col("train_id"), col("valid_id"))
      .agg(count(lit(1)).as("shared"))
  }

  /** Deterministic training-export order — the "shuffle once, globally,
    * reproducibly" step between curation and [[packs]]: every document gets
    * a shard (loader workers read disjoint shards) and a position within it,
    * ordered by the portable md5 key so the interleave is pseudo-random
    * w.r.t. ingestion order yet identical on any engine, cluster size or
    * rerun (doc_id breaks md5 ties, so the order is total). The window is
    * per shard — parallelism = nShards, no global sort, same scale shape as
    * packing. */
  def exportOrder(docs: DataFrame, nShards: Int = 8, salt: String = "order",
      keyCol: String = "doc_id"): DataFrame =
    withExportOrder(docs, nShards, salt, keyCol)
      .select(col(keyCol), col("shard"), col("ord"))

  /** Annotating form of [[exportOrder]]: adds `shard` and `ord`, keeps every
    * input column — composes into a single linear plan (no self-join) when
    * the caller needs the order alongside the data, as [[Curation]] does. */
  def withExportOrder(docs: DataFrame, nShards: Int = 8, salt: String = "order",
      keyCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val okey = md5(concat(lit(salt), col(keyCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(okey, col(keyCol))
    docs
      .withColumn("shard", pmod(col(keyCol), lit(nShards)))
      .withColumn("ord", (row_number().over(w) - 1).cast("long"))
  }

  // -- sequence packing ------------------------------------------------------

  /** Concat-and-chunk sequence packing: per shard, documents are laid out in
    * doc-id order and cut into packs of `maxTokens` whitespace tokens; a
    * document's pack is the window its FIRST token falls in (floor of the
    * exclusive prefix sum / maxTokens) — the deterministic assignment a
    * GPT-style "concatenate everything, cut every N tokens" loader produces.
    *
    * Scale: packing is per-shard (hash of doc id), so the window function
    * parallelizes across `nShards` partitions instead of one global sort —
    * matching how real packing runs (each loader worker packs its own shard).
    */
  def packs(docs: DataFrame, maxTokens: Int = 2048, nShards: Int = 8,
      idCol: String = "doc_id", textCol: String = "text",
      orderCol: Option[String] = None): DataFrame =
    withPacks(docs.withColumn("shard", pmod(col(idCol), lit(nShards))),
      maxTokens, Seq("shard"), orderCol.getOrElse(idCol), idCol, textCol)
      .select(col(idCol), col("shard"), col("n_tokens"), col("pack_id"))

  /** Annotating form of [[packs]]: adds `n_tokens` and `pack_id` over an
    * explicit partition (e.g. `(split, shard)` so train/valid packs never
    * mix) and layout-order column, keeping every input column. The window
    * order ties-break on `idCol`, so the assignment is total. */
  def withPacks(docs: DataFrame, maxTokens: Int, partitionCols: Seq[String],
      orderCol: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("pack_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / maxTokens).cast("long"))
  }

  /** Size-proportional systematic sampling (PPS): lay each shard's documents
    * out in id order and pick every document whose token span contains a
    * stride boundary (a multiple of `strideTokens`, including its own start
    * landing exactly on one) — P(pick) = min(1, n_tokens/stride), with
    * exactly ⌈shard_tokens/stride⌉ picks per shard, fully deterministic (no
    * RNG: the "random phase" is the layout) and integer-only (`div`, `%`),
    * so any engine reproduces it bit-for-bit. The standard way to draw a
    * token-budgeted subset in which long documents are proportionally
    * represented. Same per-shard prefix-sum machinery as [[packs]]:
    * parallel across shards, never a global sort. */
  def samplePps(docs: DataFrame, strideTokens: Int = 256, nShards: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", pmod(col(idCol), lit(nShards)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("__pfx", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("n_tokens") > 0 && (
        expr(s"(__pfx + n_tokens - 1) div $strideTokens") >
          expr(s"__pfx div $strideTokens") ||
          col("__pfx") % strideTokens === 0))
      .select(col(idCol), col("shard"), col("n_tokens"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each row gets key = ln(u)/w with u ∈ (0, 1] a uniform
    * derived from md5(id, salt), and the k LARGEST keys are the sample —
    * inclusion probability proportional to weight, no replacement, no RNG
    * state. Like [[datasetSplit]]/[[stratifiedSample]], the verdict is a
    * pure projection of (id, salt): reproducible across engines, reruns
    * and cluster sizes, and exactly twinned by a DuckDB oracle (md5 hex is
    * bit-identical; the hex→u→ln arithmetic is one fixed double-op order).
    *
    * Keys are emitted floor-scaled to micro units; ties (only possible at
    * the floor boundary) break on id, so the top-k cut is total-ordered.
    * The selection is `orderBy(...).limit(k)` — TakeOrderedAndProject
    * per-partition heaps, never a global sort. Rows with NULL or
    * non-positive weight are excluded (a zero weight has zero inclusion
    * probability; E-S is undefined there). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wsample"): DataFrame = {
    require(k >= 1, s"k out of range: $k")
    // 13 hex digits = 52 bits: exact in a double, v+1 keeps u > 0.
    // Column API, not an expr() string: a quoted salt or a column name
    // needing backticks must neither break the parse nor inject into it
    val v = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(salt))), 1, 13),
      16, 10).cast("long")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__u", (v + lit(1L)) / lit(4503599627370496.0))
      .withColumn("key_micro",
        floor(lit(1000000.0) * (log(col("__u")) / col(weightCol))).cast("long"))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col(weightCol), col("key_micro"))
  }

  /** Per-document unigram Shannon entropy, in integer micro-nats — the
    * diversity/repetitiveness quality signal [[repetitionFeatures]]'
    * duplicate fractions don't capture: a keyword-stuffed or
    * template-generated page has LOW entropy even when no single n-gram
    * repeats verbatim; natural prose sits near the entropy of its
    * vocabulary. H = Σ (c/n)·ln(n/c) over the doc's token frequencies.
    *
    * Determinism recipe (same as BM25/PMI): each TERM's contribution is
    * floor-scaled to an integer on its own (doc, token) row — one fixed
    * double-op order, mirrored by the oracle — and the document's entropy
    * is the exact integer SUM of those rows, so no double ever crosses
    * rows and the result is reshuffle-exact. The per-term floor biases H
    * down by < |vocab(doc)| µnats: irrelevant at quality-filter scale.
    *
    * Shuffle shape: one (doc, token) hash aggregation (map-side combined),
    * one doc-id aggregation of the integer contributions. Token counts
    * ride a join against the per-doc total rather than a window — both
    * sides are already (doc, ...) rows. Docs with no tokens emit nothing
    * (no distribution, no entropy). */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      tokens(lower(col(textCol))).as("toks"))
    val totals = base.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    base.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .join(totals, "doc_id")
      .withColumn("__contrib",
        floor(lit(1000000.0) * (col("c") / col("n_tokens")) *
          log(col("n_tokens") / col("c").cast("double"))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_tokens")).as("n_tokens"),
        sum(col("__contrib")).as("h_micro"))
  }

  // -- URL/domain analysis ----------------------------------------------------

  /** Per-domain URL counts over a corpus (provenance audits, domain quotas).
    * explode_outer + null filter rather than plain explode: the non-outer
    * generator makes the optimizer infer a size>0 filter that re-evaluates
    * the regex per row (see Router.fanOut). */
  val DomainPattern = "https?://([A-Za-z0-9.-]+)"
  def domainCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode_outer(
        regexp_extract_all(col(textCol), lit(DomainPattern), lit(1))).as("domain"))
      .filter(col("domain").isNotNull)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"))

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
