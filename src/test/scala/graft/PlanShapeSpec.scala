package graft

import graft.model.Transcripts
import graft.pipeline.Pipeline
import graft.enrich.Enrichment
import graft.parse.GrokParser
import org.apache.spark.sql.functions._

/** Plan-shape regression tests — the properties that make this engine scale
  * are facts about the OPTIMIZED PLAN, so they are asserted directly:
  * single grok evaluation, broadcast enrich join, pushed parquet filters,
  * whole-stage codegen coverage. */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("all grok evaluations live in one Project (subexpression-elimination domain)") {
    // Catalyst inlines the parse aliases into many expression copies, but as
    // long as every copy sits in a SINGLE Project operator, runtime
    // subexpression elimination evaluates the regex once per row. Copies
    // spread across Filters/Generates would each re-execute it.
    val (routed, _) = Pipeline.route(Transcripts.fromEvents(spark, sfDir), spark)
    val out = routed.select("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
    def hasGrok(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.exists(_.isInstanceOf[graft.parse.GrokExtract])
    val ops = out.queryExecution.optimizedPlan.collect {
      case p if p.expressions.exists(hasGrok) => p.getClass.getSimpleName
    }
    assert(ops.distinct.toSeq === Seq("Project"),
      s"grok must only appear in Project operators, found $ops")
    assert(ops.size <= 2, s"grok-bearing operators: $ops")
  }

  test("enrichment is a broadcast hash join, not a shuffle join") {
    val enriched = Enrichment.enrich(
      GrokParser.parse(Transcripts.fromEvents(spark, sfDir)), spark)
    val physical = enriched.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical.take(2000))
    assert(!physical.contains("SortMergeJoin"))
  }

  test("stratified sampling is a pure filter: zero exchanges in the plan") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, if (i % 2 == 0) "en" else "und"))
      .toDF("doc_id", "lang")
    val sampled = graft.text.TextAnalysis.stratifiedSample(
      docs, "lang", Map("en" -> 0.5), defaultRate = 0.25)
    val physical = sampled.queryExecution.executedPlan.treeString
    assert(!physical.contains("Exchange"),
      s"mix sampling must not shuffle: $physical")
  }

  test("boilerplate stripping anti-joins the hot set via broadcast, never sort-merge") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cleaned = graft.text.TextAnalysis.stripFrequentUnits(docs, minDf = 30, sep = " ")
    val physical = cleaned.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin") && physical.contains("LeftAnti"),
      physical.take(2000))
    assert(!physical.contains("SortMergeJoin"), physical.take(2000))
  }

  test("column pruning + filter pushdown reach the parquet scan") {
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "error")
      .select("event_id", "user_id")
    val formatted = df.queryExecution.executedPlan.toString
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("event_type"),
      s"filter not pushed: $scan")
    assert(!scan.contains("props"), s"column pruning failed: $scan")
  }

  test("route+fanout stays inside whole-stage codegen (no interpreted HOFs)") {
    // static (non-AQE) plan shows WholeStageCodegen wrapping without running
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val routed = graft.route.Router.fanOut(
        GrokParser.parse(Transcripts.fromEvents(spark, sfDir)))
      val physical = routed.queryExecution.executedPlan.treeString
      // the targets construction must not use higher-order array functions
      assert(!physical.contains("ArrayFilter") && !physical.contains("ArrayTransform"),
        "router must avoid interpreted higher-order functions")
      // codegen stages appear as *(n) markers in treeString
      assert(physical.contains("*("), physical.take(1500))
      // the grok project itself is inside a codegen stage: its Project line
      // carries the *(n) codegen marker
      val grokLine = physical.split("\n").find(_.contains("grok_extract")).get
      assert(grokLine.trim.stripPrefix("+- ").stripPrefix(":- ").startsWith("*("),
        s"grok project not codegen'd: $grokLine")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("single-pass staged plan: grok only in Projects (CSE domain), ONE exchange") {
    // the single-pass path drops the post-parse barrier exchange, so this
    // asserts the two facts that make that safe+fast: every grok copy stays
    // inside a Project (whole-stage codegen subexpression elimination ⇒ one
    // regex exec per row), and the whole job has exactly one shuffle
    // synthetic turns round-tripped through parquet: the events-derived
    // fixture adds a row_number window (its own exchange) that exists only to
    // DERIVE the sandbox table — production transcripts arrive with turn_idx
    // (DESIGN.md) — and a raw LocalRelation would be eagerly collapsed by
    // ConvertToLocalRelation, leaving no plan to inspect
    val turnsDir = java.nio.file.Files.createTempDirectory("graft-psp").toString
    Transcripts.synthetic(spark, nConvs = 20, turnsPerConv = 10)
      .write.mode("overwrite").parquet(turnsDir)
    val turns = spark.read.parquet(turnsDir)
    val fanned = graft.route.Router.fanOut(Enrichment.enrich(
      Pipeline.parsedProjected(turns), spark))
    val staged = graft.limit.SinglePassLimit.staged(fanned, saltBuckets = 32)
    def hasGrok(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.exists(_.isInstanceOf[graft.parse.GrokExtract])
    val ops = staged.queryExecution.optimizedPlan.collect {
      case p if p.expressions.exists(hasGrok) => p.getClass.getSimpleName
    }
    assert(ops.nonEmpty && ops.distinct.toSeq === Seq("Project"),
      s"grok must only appear in Project operators, found $ops")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val phys = staged.queryExecution.executedPlan.treeString
      // shuffle exchanges only — the enrich BroadcastExchange is expected
      val exchanges = "Exchange hashpartitioning".r.findAllIn(phys).length
      assert(exchanges === 1, s"single-pass plan must shuffle exactly once:\n$phys")
      assert(!phys.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("LSH banding plans are HOF-free (no interpreted ArrayTransform/ArrayFilter)") {
    import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, ArrayTransform}
    def hofOps(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case p if p.expressions.exists(_.exists(e =>
          e.isInstanceOf[ArrayTransform] || e.isInstanceOf[ArrayFilter])) =>
          p.getClass.getSimpleName
      }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val banded = graft.dedup.MinHashLSH.bandedKeys(
      docs, graft.dedup.MinHashLSH.Params(), "text", "doc_id")
    assert(hofOps(banded).isEmpty, s"minhash banding uses HOFs: ${hofOps(banded)}")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nd = graft.similarity.Ann.cosineNearDupPairs(emb, threshold = 0.9)
    assert(hofOps(nd).isEmpty, s"cosine banding uses HOFs: ${hofOps(nd)}")
    val topk = graft.similarity.Ann.lshTopK(emb.limit(5), emb, k = 3)
    assert(hofOps(topk).isEmpty, s"ann banding uses HOFs: ${hofOps(topk)}")
  }

  test("LSH candidate dedup: id-only exchanges (embeddings never shuffle), HOF-free pairing") {
    import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ArrayFilter, ArrayTransform}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // every exchange in the candidate-pair stage carries ids only — the
      // round-3 formulation shuffled both embedding arrays through the
      // distinct (~2·d·4 bytes per candidate instead of 16)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val cands = graft.similarity.Ann.candidatePairs(emb)
      val exchanges = cands.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      val embCols = exchanges.flatMap(_.output).filter(_.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      })
      assert(embCols.isEmpty, s"embedding columns cross candidate exchanges: $embCols")
      // the full MinHash pairs plan (incl. in-bucket pairing, round 4's
      // generator chain) carries no interpreted lambda HOF anywhere
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val pairs = graft.dedup.MinHashLSH.nearDupPairs(docs)
      val hofs = pairs.queryExecution.optimizedPlan.collect {
        case p if p.expressions.exists(_.exists(e =>
          e.isInstanceOf[ArrayTransform] || e.isInstanceOf[ArrayFilter] ||
            e.isInstanceOf[ArrayAggregate])) => p.getClass.getSimpleName
      }
      assert(hofs.isEmpty, s"interpreted HOFs in minhash pairs plan: $hofs")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("limit-chain plan reuses the salted exchange instead of rescanning") {
    val (routed, _) = Pipeline.route(Transcripts.fromEvents(spark, sfDir), spark)
    val physical = routed.queryExecution.optimizedPlan.toString
    val scans = "parquet".r.findAllIn(physical).length
    assert(scans <= 1, s"the returned routed plan must scan the fact table once " +
      s"(verdicts are precomputed driver-side), found $scans:\n" + physical.take(3000))
  }
}
