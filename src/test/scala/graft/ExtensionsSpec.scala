package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-facing registration of the custom expressions (reference analog: the
  * provider switch registering sources/targets, cmd/run.go:66-89). Uses its
  * own session because extensions bind at session build time. */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate() reuses any existing session, so conf-time extensions can't
  // be asserted inside the shared-suite JVM; use an isolated child session
  // with runtime registration (the conf path is exercised by tools/Sql).
  private lazy val spark: SparkSession = {
    val s = TestSpark.spark.newSession()
    GraftExtensions.register(s)
    s
  }

  test("grok_extract is callable from SQL and parses the standard pattern") {
    spark.sparkContext.setLogLevel("ERROR")
    val row = spark.sql(
      s"""SELECT grok_extract('[INFO] tool=bash dur=42ms status=ok hello world',
         '${graft.parse.GrokParser.Pattern.replace("\\", "\\\\")}') AS g""")
      .selectExpr("g.level", "g.tool", "g.dur_ms", "g.status", "g.payload")
      .collect()(0)
    assert(row.getString(0) === "INFO")
    assert(row.getString(1) === "bash")
    assert(row.getInt(2) === 42)
    assert(row.getString(3) === "ok")
    assert(row.getString(4) === "hello world")
  }

  test("simhash64 / minhash_signature / word_shingles from SQL") {
    val r = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
         minhash_signature(array('a b c'), 4) AS mh,
         word_shingles('A  b c', 2) AS ws""").collect()(0)
    assert(r.getLong(0) !== 0L)
    assert(r.getSeq[Long](1).length === 4)
    assert(r.getSeq[String](2).toSeq === Seq("a b", "b c"))
    // SQL results equal the Column-API kernels
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaCol = Seq("A  b c").toDF("t")
      .select(graft.functions.WordShinglesFunctions.word_shingles(col("t"), 2))
      .collect()(0).getSeq[String](0)
    assert(viaCol.toSeq === r.getSeq[String](2).toSeq)
  }

  test("nfc_normalize from SQL composes combining marks") {
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS n, nfc_normalize('ascii') AS a")
      .collect()(0)
    assert(r.getString(0) === "caf\u00e9")
    assert(r.getString(1) === "ascii")
  }

  // ---- table functions (GraftTableFunctions): the FROM-clause surface ----

  private def tvfFixtures(): Unit = {
    import spark.implicits._
    Seq(("a", 100L, 1L), ("a", 150L, 2L), ("a", 50L, 3L), ("b", 500L, 4L))
      .toDF("k", "ts", "row_id").createOrReplaceTempView("tvf_probe")
    Seq(("a", 100L, 10L), ("a", 140L, 14L), ("b", 400L, 40L))
      .toDF("k", "snap_ts", "version").createOrReplaceTempView("tvf_build")
  }

  test("asof_join / asof_join_broadcast from SQL match the Column API") {
    tvfFixtures()
    for (f <- Seq("asof_join", "asof_join_broadcast")) {
      val got = spark.sql(
        s"""SELECT row_id, version
            FROM $f('tvf_probe', 'tvf_build', 'k', 'ts', 'snap_ts')""")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got === Map(1L -> Some(10L), 2L -> Some(14L), 3L -> None, 4L -> Some(40L)), f)
    }
    // literal maxStaleness as the optional 6th argument
    val bounded = spark.sql(
      """SELECT row_id, version
         FROM asof_join_broadcast('tvf_probe', 'tvf_build', 'k', 'ts', 'snap_ts', 10)""")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(bounded === Map(1L -> Some(10L), 2L -> Some(14L), 3L -> None, 4L -> None))
  }

  test("range_join / overlap_join / top_k / apply_changelog from SQL") {
    import spark.implicits._
    tvfFixtures()
    Seq(("a", 90L, 120L, 7L)).toDF("k", "w_start", "w_end", "win_id")
      .createOrReplaceTempView("tvf_windows")
    val rj = spark.sql(
      """SELECT row_id, win_id
         FROM range_join('tvf_probe', 'tvf_windows', 'k', 'ts', 'w_start', 'w_end', 50)""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rj === Set((1L, 7L))) // only ts=100 \u2208 [90,120]

    Seq(("a", 60L, 95L, 9L)).toDF("k", "l_start", "l_end", "iv_id")
      .createOrReplaceTempView("tvf_spans")
    val oj = spark.sql(
      """SELECT iv_id, win_id
         FROM overlap_join('tvf_spans', 'tvf_windows', 'k',
                           'l_start', 'l_end', 'w_start', 'w_end', 50)""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oj === Set((9L, 7L))) // [60,95] \u2229 [90,120] \u2260 \u2205

    val tk = spark.sql(
      """SELECT k, ts, rnk FROM top_k('tvf_probe', 'k', 'ts DESC', 1, 'rnk')""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(tk === Set(("a", 150L, 1), ("b", 500L, 1)))

    Seq(("a", 100L, 1L, "U", 1L), ("c", 999L, 5L, "I", 1L), ("b", 500L, 4L, "D", 1L))
      .toDF("k", "ts", "row_id", "op", "seq").createOrReplaceTempView("tvf_changes")
    val merged = spark.sql(
      """SELECT k, ts, row_id
         FROM apply_changelog('tvf_probe', 'tvf_changes', 'k,ts', 'seq', 'op')""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === Set(
      ("a", 100L, 1L), ("a", 150L, 2L), ("a", 50L, 3L), // b@500 deleted
      ("c", 999L, 5L)))                                 // insert applied
  }

  test("diff_snapshots / scd2_history from SQL") {
    import spark.implicits._
    tvfFixtures()
    Seq(("a", 100L, 1L), ("a", 150L, 9L), ("c", 7L, 7L))
      .toDF("k", "ts", "row_id").createOrReplaceTempView("tvf_new")
    val diff = spark.sql(
      """SELECT k, ts, row_id, op
         FROM diff_snapshots('tvf_probe', 'tvf_new', 'k,ts')""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(diff === Set(
      ("a", 150L, 9L, "U"), ("a", 50L, 3L, "D"),
      ("b", 500L, 4L, "D"), ("c", 7L, 7L, "I")))
    Seq(("a", 100L, 10L, "I", 1L), ("a", 180L, 18L, "U", 2L), ("a", 250L, 0L, "D", 3L))
      .toDF("k", "ts", "version", "op", "seq")
      .createOrReplaceTempView("tvf_changes_scd")
    val hist = spark.sql(
      """SELECT k, version, valid_from, valid_to, is_current
         FROM scd2_history('tvf_changes_scd', 'k', 'seq', 'op', 'ts')""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet
    assert(hist === Set(
      ("a", 10L, 100L, Some(180L), false),
      ("a", 18L, 180L, Some(250L), false))) // the delete closed version 18
  }

  test("active_intervals from SQL matches the Column API") {
    import spark.implicits._
    Seq((0L, 29L), (5L, 19L), (10L, 39L))
      .toDF("s", "e").createOrReplaceTempView("tvf_spans")
    val got = spark.sql(
      "SELECT * FROM active_intervals('tvf_spans', 's', 'e', 10, 4)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L, 10L -> 3L, 20L -> 2L, 30L -> 1L, 40L -> 0L))
  }

  test("fill_forward / counter_increase from SQL match the Column API") {
    import spark.implicits._
    Seq(("a", 100L, 10L), ("a", 250L, 20L), ("a", 300L, 30L))
      .toDF("k", "ts_us", "v").createOrReplaceTempView("tvf_obs")
    val got = spark.sql(
      "SELECT * FROM fill_forward('tvf_obs', 'k', 'ts_us', 100)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq(("a", 100L, 10L), ("a", 200L, 10L), ("a", 300L, 30L)))

    Seq(("a", 1L, 5L), ("a", 2L, 9L), ("a", 3L, 2L))
      .toDF("k", "ts", "c").createOrReplaceTempView("tvf_counter")
    val inc = spark.sql(
      "SELECT ts, increase FROM counter_increase('tvf_counter', 'k', 'ts', 'c')")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(inc === Map(1L -> None, 2L -> Some(4L), 3L -> Some(2L)))
  }

  test("mad_flags / page_rank / postings / bm25 / profile_drift from SQL match the Column API") {
    import spark.implicits._
    // anomaly: flatline then a jump (window 4, k 6)
    Seq(7L, 7L, 7L, 7L, 7L, 9L).zipWithIndex
      .map { case (v, i) => ("a", i.toLong, v) }
      .toDF("k", "t", "v").createOrReplaceTempView("tvf_series")
    val flags = spark.sql(
      "SELECT t, anomaly FROM mad_flags('tvf_series', 'k', 't', 'v', 4, 6)")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(flags(4L) === Some(0) && flags(5L) === Some(1))

    val spokes = (1 to 4).map(i => ("hub", s"l$i"))
    (spokes ++ spokes.map(_.swap)).toDF("src", "dst")
      .createOrReplaceTempView("tvf_edges")
    val pr = spark.sql("SELECT * FROM page_rank('tvf_edges', 3)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("hub") > pr("l1") && pr.size === 5)

    Seq((1L, "x y x"), (2L, "y z")).toDF("doc_id", "text")
      .createOrReplaceTempView("tvf_docs")
    val posts = spark.sql(
      "SELECT * FROM postings('tvf_docs', 'doc_id', 'text', 1, 100)")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(posts(("x", 1L)) === 2L && posts(("y", 2L)) === 1L)
    val hits = spark.sql(
      "SELECT * FROM bm25('tvf_docs', 'doc_id', 'text', 'z', 1)").collect()
    assert(hits.length === 1 && hits.head.getLong(0) === 2L)

    spark.sql("SELECT doc_id, text FROM tvf_docs")
      .createOrReplaceTempView("tvf_docs_after")
    Seq((1L, "x y x", "en"), (2L, "y z", "de")).toDF("doc_id", "text", "lang")
      .createOrReplaceTempView("tvf_docs_before")
    val drift = spark.sql(
      "SELECT `column`, status FROM profile_drift('tvf_docs_before', 'tvf_docs_after')")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(drift("lang") === "dropped" && drift("text") === "stable")
  }

  test("bloom_agg / misra_gries aggregate from SQL text") {
    import spark.implicits._
    (Seq.fill(30)("hot") ++ (1 to 10).map(i => s"cold$i")).toDF("w")
      .createOrReplaceTempView("tvf_words")
    val mg = spark.sql("SELECT misra_gries(w, 4) AS m FROM tvf_words")
      .collect().head.getAs[Map[String, Long]]("m")
    assert(mg.contains("hot"), s"item above n/k must be summarized: $mg")
    assert(mg.size <= 3)
    val bloom = spark.sql("SELECT bloom_agg(w, 100, 0.01) AS b FROM tvf_words")
      .collect().head.getAs[Array[Byte]]("b")
    assert(graft.functions.BloomAgg.mightContain(bloom, "hot"))
    assert(graft.functions.BloomAgg.mightContain(bloom, "cold7"))
  }

  test("jaccard_pairs / heavy_hitters / weighted_sample from SQL text") {
    import spark.implicits._
    Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w")).toDF("doc_id", "text")
      .createOrReplaceTempView("tvf_sim_docs")
    val pairs = spark.sql(
      "SELECT id_a, id_b, jaccard_milli FROM jaccard_pairs('tvf_sim_docs', 'doc_id', 'text', 1, 500)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs === Seq((1L, 2L, 600L)))

    (Seq.fill(20)("hot") ++ (1 to 10).map(i => s"c$i")).toDF("w")
      .createOrReplaceTempView("tvf_hh")
    val hh = spark.sql("SELECT * FROM heavy_hitters('tvf_hh', 'w', 2)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh === Map("hot" -> 20L))

    (0L until 50L).map(i => (i, 3L)).toDF("id", "wt")
      .createOrReplaceTempView("tvf_ws")
    val ws = spark.sql(
      "SELECT * FROM weighted_sample('tvf_ws', 'id', 'wt', 5, 'abc')")
      .collect()
    assert(ws.length === 5)
    val sameAsApi = graft.text.TextAnalysis.weightedSample(
      spark.table("tvf_ws"), "id", "wt", 5, "abc").collect()
    assert(ws.map(_.getLong(0)).toSeq === sameAsApi.map(_.getLong(0)).toSeq)
  }

  test("table functions reject non-literal or malformed options with a clear error") {
    tvfFixtures()
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM top_k('tvf_probe', 'k', 'ts SIDEWAYS', 1)").collect()
    }
    assert(e.getMessage.contains("ASC|DESC"), e.getMessage)
  }
}
