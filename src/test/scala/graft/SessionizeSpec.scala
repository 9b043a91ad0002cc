package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.agg.Sessionize
import graft.streaming.StreamingPipeline

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Long, us: Long = 0): Timestamp = {
    val ts = new Timestamp(s * 1000L)
    ts.setNanos((us * 1000L).toInt)
    ts
  }

  // conv A: turns at 0s, 100s, 5000s (gap > 1800 -> new session), 5100s
  // conv B: single turn
  private val turns = Seq(
    ("A", 0, t(0)), ("A", 1, t(100)), ("A", 2, t(5000)), ("A", 3, t(5100)),
    ("B", 0, t(7))
  ).toDF("conv_id", "turn_idx", "ts")

  test("gap-based session indices: handcrafted boundaries") {
    val out = Sessionize.sessionize(turns, gapSeconds = 1800L)
      .select("conv_id", "turn_idx", "session_idx")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("A", 0) -> 0L, ("A", 1) -> 0L, ("A", 2) -> 1L, ("A", 3) -> 1L,
      ("B", 0) -> 0L))
    val roll = Sessionize.sessions(turns, gapSeconds = 1800L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(roll === Set(("A", 0L, 2L), ("A", 1L, 2L), ("B", 0L, 1L)))
  }

  test("sub-second gap precision and the half-open boundary (session_window convention)") {
    val edge = Seq(
      ("C", 0, t(0)), ("C", 1, t(1800, 1)),      // 1800.000001s -> break
      ("D", 0, t(0)), ("D", 1, t(1799, 999999)), // 1799.999999s -> merge
      ("E", 0, t(0)), ("E", 1, t(1800))          // EXACTLY 1800s -> break (>=)
    ).toDF("conv_id", "turn_idx", "ts")
    val idx = Sessionize.sessionize(edge, gapSeconds = 1800L)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(idx(("C", 1)) === 1L)
    assert(idx(("D", 1)) === 0L)
    // half-open [t, t+gap): an event AT the boundary opens a new session —
    // identical to session_window, so batch and streaming agree everywhere
    assert(idx(("E", 1)) === 1L)
  }

  test("agrees with Spark's built-in session_window aggregation") {
    // pseudo-random sub-second-jittered gaps; exact-boundary behavior is
    // pinned separately (both paths use the same half-open >= convention)
    val data = (for {
      c <- 0 until 7
      i <- 0 until 40
    } yield {
      val step = 13L + ((c * 40 + i) * 997L) % 3600L // 13s .. ~1h
      (s"conv-$c", i, step)
    }).groupBy(_._1).toSeq.flatMap { case (cid, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, i, step) => acc += step; (cid, i, t(acc, 137L * i % 1000000)) }
    }
    val df = data.toDF("conv_id", "turn_idx", "ts")
    val gap = 1800L
    val mine = Sessionize.sessions(df, gap)
      .select("conv_id", "start_us", "n_turns")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val builtin = df
      .groupBy(col("conv_id"), session_window(col("ts"), s"$gap seconds"))
      .agg(count(lit(1)).as("n_turns"), min(unix_micros(col("ts"))).as("start_us"))
      .select("conv_id", "start_us", "n_turns")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mine === builtin)
    assert(mine.size > data.map(_._1).distinct.size, "gap must split some conversations")
  }

  test("streaming sessionization equals the batch rollup on the same files") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = Files.createTempDirectory("graft-sess").toString
    // 12 convs x 30 turns with varied gaps (same shape as the parity test)
    val data = (for { c <- 0 until 12; i <- 0 until 30 } yield {
      val step = 13L + ((c * 30 + i) * 997L) % 3600L
      (s"conv-$c", i, step)
    }).groupBy(_._1).toSeq.flatMap { case (cid, rows) =>
      var acc = 0L
      rows.sortBy(_._2).map { case (_, i, step) => acc += step; (cid, i, t(acc, 137L * i % 1000000)) }
    }
    // one time-ordered file: a file source feeds files in unordered batches,
    // and events behind an already-advanced watermark would be dropped —
    // that's correct streaming semantics, but this test wants the closed-
    // session subset relation, not late-data behavior
    data.sortBy(_._3.getTime).toDF("conv_id", "turn_idx", "ts")
      .coalesce(1).write.mode("overwrite").parquet(dir)

    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingPipeline.sessionAgg(stream, gap = "30 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // Append mode emits only watermark-CLOSED sessions; compare on the
    // batch result restricted to the same closed set
    val streamed = spark.table("sess_out")
      .select("conv_id", "start_us", "end_us", "n_turns")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Sessionize.sessions(spark.read.parquet(dir), gapSeconds = 1800L)
      .select("conv_id", "start_us", "end_us", "n_turns")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "watermark closed no sessions")
    assert(streamed.subsetOf(batch),
      s"streamed-only sessions: ${(streamed -- batch).take(5)}")
    // only sessions in the trailing watermark+gap horizon may stay open
    assert(streamed.size >= batch.size - 3 * 12,
      s"too few closed sessions: ${streamed.size} of ${batch.size}")
  }

  test("sessionize plan carries one exchange (both windows share the conv partition)") {
    val plan = Sessionize.sessionize(turns).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length === 1, plan.take(1200))
  }

  test("sessionPacks fails fast on a NULL conv id (the !rlike guard alone null-skips)") {
    val bad = Seq((null.asInstanceOf[String], 0, t(0), "some words here"))
      .toDF("conv_id", "turn_idx", "ts", "text")
    val e = intercept[Exception] {
      Sessionize.sessionPacks(bad).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("conv-<digits>")),
      s"expected the raise_error guard, got: ${e.getMessage}")
  }

  test("sessionPacks fails fast on conv ids outside the input_hint contract") {
    val bad = Seq(("oops", 0, t(0), "some words here"))
      .toDF("conv_id", "turn_idx", "ts", "text")
    val e = intercept[Exception] {
      Sessionize.sessionPacks(bad).collect()
    }
    // under ANSI (Spark 4 default) the malformed numeric cast itself fails
    // fast; with ANSI off the raise_error guard catches the resulting null
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m =>
      m != null && (m.contains("conv-<digits>") || m.contains("CAST_INVALID_INPUT"))),
      s"expected a fail-fast, got: ${e.getMessage}")
    // a LONGER numeric suffix is conforming and shards on the ENTIRE suffix
    // (the earlier substring(…, 6, 5) silently truncated 'conv-123456' to
    // '12345' — the id-shape guard now covers the whole id)
    val long = Seq(("conv-123456", 0, t(0), "some words here"))
      .toDF("conv_id", "turn_idx", "ts", "text")
    val shard = Sessionize.sessionPacks(long).select("shard").collect()(0).getLong(0)
    assert(shard === 123456L % 8)
  }

  test("session-aware packing: no session splits, first-token rule holds, two exchanges") {
    // needs the full transcript schema (text + conv-NNNNN ids for the
    // portable shard key) — the suite's handcrafted fixture has neither.
    // Parquet round-trip so the plan assertion sees the OPERATOR's
    // exchanges, not the fixture derivation's own window shuffle.
    val dir = java.nio.file.Files.createTempDirectory("graft-spack").toString
    graft.model.Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    val full = spark.read.parquet(dir)
    val packs = Sessionize.sessionPacks(full, gapSeconds = 1800L,
      maxTokens = 64, nShards = 4)
    val rows = packs.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // one pack per session by construction — and the whole-session turn join
    // agrees: every turn of a session lands in its session's single pack
    val turnPacks = Sessionize.sessionize(full, 1800L)
      .join(packs, Seq("conv_id", "session_idx"))
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(countDistinct(col("pack_id")).as("n_packs"))
      .filter(col("n_packs") =!= 1).count()
    assert(turnPacks === 0L, "a session straddled a pack boundary")
    // first-token rule, recomputed independently: within a shard (in
    // (conv, session) order) a session's pack is floor(prefix / maxTokens)
    rows.groupBy(_._4).foreach { case (shard, ss) =>
      var prefix = 0L
      ss.sortBy(s => (s._1, s._2)).foreach { case (conv, sess, nt, _, packId) =>
        assert(packId === prefix / 64, s"shard $shard $conv/$sess: $packId vs prefix $prefix")
        prefix += nt
      }
    }
    // shards partition conversations: a conversation never crosses shards
    assert(rows.groupBy(_._1).forall { case (_, ss) => ss.map(_._4).distinct.length == 1 })
    // plan: conv-partition windows + session rollup share ONE exchange; the
    // per-shard prefix window re-keys once — exactly two (count the FINAL
    // AQE plan only; the string repeats every exchange in the initial plan)
    val plan = packs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange".r.findAllIn(plan).length === 2, plan.take(1500))
  }
}
