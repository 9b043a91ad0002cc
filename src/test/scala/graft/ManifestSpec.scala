package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.pipeline.Pipeline
import graft.manifest.Manifest

/** Idempotent-resume semantics: a killed run, rerun, must produce sink
  * contents identical to a clean run with zero duplicates — the inversion of
  * the reference's emit-then-mark race (reference source/nomad/worker.go:149-154,
  * SURVEY.md §4.3). */
class ManifestSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def readAllSinks(root: String): DataFrame = {
    val m = new Manifest(root)
    m.committedSinks().toSeq.sorted
      .map(s => m.sinkRows(spark, s))
      .reduce(_ unionByName _)
  }

  private def canon(df: DataFrame): Array[String] =
    df.select("conv_id", "turn_idx", "sink", "text")
      .collect()
      .map(r => s"${r.getString(0)}|${r.getInt(1)}|${r.getString(2)}|${r.getString(3)}")
      .sorted

  test("clean run commits every sink and the manifest lists them") {
    val out = Files.createTempDirectory("graft-clean").toString
    Pipeline.run(spark, sfDir, out, runId = "clean")
    val m = new Manifest(out)
    assert(m.committedSinks().nonEmpty)
    assert(readAllSinks(out).count() > 0)
  }

  test("killed-after-2-sinks rerun equals a clean run, no duplicates") {
    val cleanOut = Files.createTempDirectory("graft-a").toString
    val resumeOut = Files.createTempDirectory("graft-b").toString

    Pipeline.run(spark, sfDir, cleanOut, runId = "r0")
    // simulated kill: only 2 sinks commit
    Pipeline.run(spark, sfDir, resumeOut, runId = "r1", failAfterSinks = 2)
    val partial = new Manifest(resumeOut).committedSinks()
    assert(partial.size === 2, s"expected partial commit, got $partial")
    // resume: full rerun against the same outRoot
    Pipeline.run(spark, sfDir, resumeOut, runId = "r2")

    val clean = canon(readAllSinks(cleanOut))
    val resumed = canon(readAllSinks(resumeOut))
    assert(resumed.length === clean.length, "row counts differ after resume")
    assert(resumed.sameElements(clean), "sink contents differ after resume")
    // no duplicates: (conv_id, turn_idx, sink) unique
    assert(resumed.distinct.length === resumed.length)
  }

  test("manifest entries are queryable as a DataFrame (metrics-as-SQL)") {
    val out = Files.createTempDirectory("graft-entries").toString
    Pipeline.run(spark, sfDir, out, runId = "rq")
    val e = new Manifest(out).entries(spark)
    e.createOrReplaceTempView("manifest")
    val total = spark.sql(
      "SELECT sum(row_count) FROM manifest WHERE sink IS NOT NULL").collect()(0).getLong(0)
    assert(total > 0)
    // the observe()-based run metrics row is present too
    assert(e.columns.contains("routed_rows") || e.columns.contains("row_count"))
  }

  test("run() metrics come from the manifest — equal a recompute, no sink rescan") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft-metrics").toString
    val result = Pipeline.run(spark, sfDir, out, runId = "rm")
    // the returned plan must NOT scan the written sink parquet (at 100 TB
    // that's a full second read of everything just written)
    val planStr = result.queryExecution.optimizedPlan.toString
    assert(!planStr.contains("/sinks/"), s"run() metrics rescan sink output:\n$planStr")
    // values equal the per-sink aggregate recomputed from the actual output
    val recomputed = graft.agg.SinkMetrics.perSink(readAllSinks(out))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val fromManifest = result
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fromManifest === recomputed)
  }

  test("per-sink live counters in the run metrics match the committed entries") {
    val out = Files.createTempDirectory("graft-counters").toString
    Pipeline.run(spark, sfDir, out, runId = "rc")
    // (_-prefixed files are invisible to path-based readers — read content)
    import spark.implicits._
    val mdf = spark.read.json(Seq(
      Files.readString(java.nio.file.Paths.get(s"$out/_manifest/_metrics_rc.json"))).toDS())
    val ps = mdf.select("per_sink").collect()(0).getStruct(0)
    val perSink = ps.schema.fieldNames.map { s =>
      val c = ps.getStruct(ps.fieldIndex(s))
      s -> (c.getLong(c.fieldIndex("out_rows")), c.getLong(c.fieldIndex("out_bytes")),
        c.getLong(c.fieldIndex("in_rows")), c.getLong(c.fieldIndex("dropped_rows")))
    }.toMap
    // counters observed during the run == what was actually committed
    val entries = new Manifest(out).entries(spark)
      .filter(org.apache.spark.sql.functions.col("sink").isNotNull)
      .collect().map(r => r.getAs[String]("sink") ->
        (r.getAs[Long]("row_count"), r.getAs[Long]("bytes"))).toMap
    entries.foreach { case (sink, (rows, bytes)) =>
      assert(perSink(sink)._1 === rows, s"out_rows for $sink")
      assert(perSink(sink)._2 === bytes, s"out_bytes for $sink")
    }
    // conservation: everything routed in either survived somewhere or dropped
    assert(perSink.values.map(_._3).sum ===
      perSink.values.map(_._1).sum + perSink.values.map(_._4).sum)
  }

  test("per-stage counters conserve: scan = parse_ok + quarantined; dead-letter accounted") {
    val out = Files.createTempDirectory("graft-stages").toString
    Pipeline.run(spark, sfDir, out, runId = "rs")
    import spark.implicits._
    val mdf = spark.read.json(Seq(
      Files.readString(java.nio.file.Paths.get(s"$out/_manifest/_metrics_rs.json"))).toDS())
    val st = mdf.select("stages").collect()(0).getStruct(0)
    def stage(name: String) = st.getStruct(st.fieldIndex(name))
    def l(s: org.apache.spark.sql.Row, f: String) = s.getLong(s.fieldIndex(f))
    val scanRows = l(stage("scan"), "rows")
    val parseOk = l(stage("parse"), "rows_ok")
    val quarantined = l(stage("parse"), "rows_quarantined")
    val routeIn = l(stage("route"), "rows_in")
    val deadLetter = l(stage("route"), "rows_dead_letter")
    val fanout = l(stage("route"), "fanout_rows")
    assert(scanRows > 0)
    // conservation: every scanned row either parsed or was quarantined
    assert(parseOk + quarantined === scanRows, s"parse stage leaks rows")
    // the router sees every parsed row exactly once (fan-out happens after)
    assert(routeIn === scanRows, s"route_in $routeIn != scan $scanRows")
    // fan-out only duplicates, never drops: each input row emits >= 1 output
    assert(fanout >= routeIn)
    // quarantined rows are a subset of the dead-letter rows (unmatched adds more)
    assert(deadLetter >= quarantined)
    // cross-counter check: the stage counter equals the limiter-cell counter
    // for the dead_letter sink (both observed on the same run)
    val ps = mdf.select("per_sink").collect()(0).getStruct(0)
    val dl = ps.getStruct(ps.fieldIndex("dead_letter"))
    assert(dl.getLong(dl.fieldIndex("in_rows")) === deadLetter,
      "stage dead-letter count != per-sink in_rows for dead_letter")
  }

  test("metrics HTTP endpoint serves sink entries and live run counters (A4)") {
    val out = Files.createTempDirectory("graft-http").toString
    Pipeline.run(spark, sfDir, out, runId = "rh")
    val srv = new graft.manifest.MetricsHttp(out, 0)
    val port = srv.start()
    try {
      def get(path: String): String = {
        val client = java.net.http.HttpClient.newHttpClient()
        client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      }
      import spark.implicits._
      val sinks = spark.read.json(Seq(get("/sinks")).toDS())
      assert(sinks.count() === new Manifest(out).committedSinks().size.toLong)
      assert(sinks.columns.contains("row_count"))
      val runs = spark.read.json(Seq(get("/runs")).toDS())
      assert(runs.count() === 1L)
      assert(runs.columns.contains("per_sink"))
      assert(get("/healthz").contains("ok"))

      // Prometheus text exposition: parse every sample line and cross-check
      // against the manifest entries (reference web/server.go:32 parity)
      val prom = get("/metrics")
      val sample = """^(\w+)(?:\{(\w+)="([^"]+)"\})? (-?\d+)$""".r
      val samples = prom.linesIterator.filterNot(_.startsWith("#")).map {
        case sample(name, _, label, value) => (name, Option(label), value.toLong)
        case bad => fail(s"unparseable exposition line: '$bad'")
      }.toSeq
      assert(samples.nonEmpty)
      val entries2 = new Manifest(out).entries(spark)
        .filter(org.apache.spark.sql.functions.col("sink").isNotNull)
        .collect().map(r => r.getAs[String]("sink") -> r.getAs[Long]("row_count")).toMap
      val promRows = samples.collect {
        case ("graft_sink_rows_total", Some(sink), v) => sink -> v
      }.toMap
      assert(promRows === entries2, s"prometheus sink rows mismatch: $promRows vs $entries2")
      assert(samples.exists(_._1 == "graft_runs_total"))
      assert(samples.exists(_._1 == "graft_stage_rows_total"))
      assert(samples.exists(_._1 == "graft_sink_in_rows_total"))
    } finally srv.stop()
  }

  test("HTML status page: sink table, live roster, endpoint links, 404 elsewhere") {
    val out = Files.createTempDirectory("graft-html").toString
    Pipeline.run(spark, sfDir, out, runId = "rhtml")
    val srv = new graft.manifest.MetricsHttp(out, 0, spark = Some(spark))
    val port = srv.start()
    try {
      def get(path: String): java.net.http.HttpResponse[String] = {
        val client = java.net.http.HttpClient.newHttpClient()
        client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val page = get("/")
      assert(page.statusCode() === 200)
      assert(page.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      val html = page.body()
      new Manifest(out).committedSinks().foreach { s =>
        assert(html.contains(s"<td>$s</td>"), s"sink $s missing from status page")
      }
      Seq("/sinks", "/runs", "/snapshots", "/metrics", "/cluster").foreach { l =>
        assert(html.contains(s"""href="$l""""), s"missing link $l")
      }
      assert(html.contains("Executors") && html.contains("<td>"))
      assert(get("/no-such-page").statusCode() === 404)
    } finally srv.stop()
  }

  test("cluster view endpoint: executor roster, ?node= filter, sidecar degradation") {
    val out = Files.createTempDirectory("graft-cluster").toString
    val srv = new graft.manifest.MetricsHttp(out, 0, spark = Some(spark))
    val port = srv.start()
    try {
      def get(path: String): String = {
        val client = java.net.http.HttpClient.newHttpClient()
        client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString()).body()
      }
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val cluster = om.readTree(get("/cluster"))
      assert(cluster.get("mode").asText() === "live")
      val execs = cluster.get("executors")
      assert(execs.size() >= 1, "local mode must report the driver executor")
      assert(cluster.get("default_parallelism").asInt() === 4)
      val first = execs.get(0)
      assert(first.has("node") && first.has("running_tasks")
        && first.has("total_onheap_storage"))
      // ?node= narrows to one executor (the reference's per-node proxy shape)
      val id = first.get("node").asText()
      val one = om.readTree(get(s"/cluster?node=${java.net.URLEncoder.encode(id, "UTF-8")}"))
      assert(one.get("executors").size() === 1)
      assert(om.readTree(get("/cluster?node=nope:0")).get("executors").size() === 0)
      // a malformed query must get an ANSWER (4xx), never a dropped exchange
      // (connection reset). The JDK server pre-validates the request URI and
      // answers its own 400 for an invalid percent escape; paramHandler's
      // try/catch is the second line of defense for anything that gets
      // through (and turns body() failures into 500s). Raw socket: the JDK
      // http client would refuse to send the malformed URI at all.
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        sock.getOutputStream.write(
          s"GET /cluster?node=%zz HTTP/1.1\r\nHost: 127.0.0.1:$port\r\nConnection: close\r\n\r\n"
            .getBytes("US-ASCII"))
        sock.getOutputStream.flush()
        val resp = new String(sock.getInputStream.readAllBytes(), "UTF-8")
        assert(resp.startsWith("HTTP/1.1 400"), s"expected 400, got: ${resp.take(80)}")
      } finally sock.close()
      // sidecar mode (no session attached) degrades, not crashes
      val side = new graft.manifest.MetricsHttp(out, 0)
      val sp = side.start()
      try {
        val body = om.readTree(get2(sp, "/cluster"))
        assert(body.get("mode").asText() === "sidecar")
        assert(body.get("executors").size() === 0)
      } finally side.stop()
    } finally srv.stop()
  }

  private def get2(port: Int, path: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    client.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }

  test("stream time travel: streamSinkAsOf pins a snapshot while batches keep landing") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-tt").toString
    val m = new Manifest(out)
    def batch(ids: Seq[Int]) = ids
      .map(i => (s"conv-0000$i", i, "user", s"text $i", "t", new java.sql.Timestamp(i * 1000L), "s1"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
    m.commitStreamBatch(batch(Seq(1, 2)), 0L)
    val snapAfterB0 = m.currentSnapshotId()
    m.commitStreamBatch(batch(Seq(3)), 1L)

    def ids(df: org.apache.spark.sql.DataFrame): Set[Int] =
      if (df.columns.isEmpty) Set.empty
      else df.select("turn_idx").collect().map(_.getInt(0)).toSet
    // pinned snapshot: repeatable read sees only batch 0 even after batch 1 landed
    assert(ids(m.streamSinkAsOf(spark, "s1", snapAfterB0)) === Set(1, 2))
    // current snapshot sees everything; snapshot 0 predates every commit
    assert(ids(m.streamSinkAsOf(spark, "s1", m.currentSnapshotId())) === Set(1, 2, 3))
    assert(ids(m.streamSinkAsOf(spark, "s1", 0L)) === Set.empty)
    // unknown sink: empty, not an error
    assert(ids(m.streamSinkAsOf(spark, "nope", Long.MaxValue)) === Set.empty)
  }

  test("retention sweep: expireSnapshots compacts the log; pinned reads below the " +
      "horizon fail fast; servable pins stay exact; missing data dirs are refused") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-ret").toString
    val m = new Manifest(out)
    def batch(ids: Seq[Int]) = ids
      .map(i => (s"conv-0000$i", i, "user", s"text $i", "t", new java.sql.Timestamp(i * 1000L), "s1"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
    // five stream batches → audit records at snapshot ids 1..5, batches 0..4
    (0 until 5).foreach(i => m.commitStreamBatch(batch(Seq(i + 1)), i.toLong))
    assert(m.currentSnapshotId() === 5L)

    // keepLast=2 → horizon 4: records 1..3 (batches 0..2) expire and compact
    val expired = m.expireSnapshots(keepLast = 2)
    assert(expired === Seq(1L, 2L, 3L))
    assert(m.snapshots(spark).count() === 2L, "/snapshots must reflect the sweep")
    assert(m.retention() ===
      Manifest.Retention(4L, Map("s1" -> Manifest.Retention.Base(2L, 3L))))
    // re-sweep is an idempotent no-op
    assert(m.expireSnapshots(keepLast = 2) === Seq.empty)

    def ids(df: org.apache.spark.sql.DataFrame): Set[Int] =
      if (df.columns.isEmpty) Set.empty
      else df.select("turn_idx").collect().map(_.getInt(0)).toSet
    // servable pins reconstruct the expired prefix from the compacted base
    assert(ids(m.streamSinkAsOf(spark, "s1", 5L)) === Set(1, 2, 3, 4, 5))
    assert(ids(m.streamSinkAsOf(spark, "s1", 4L)) === Set(1, 2, 3, 4))
    // a pin below the horizon fails FAST — never a partial answer
    val e = intercept[IllegalStateException] { m.streamSinkAsOf(spark, "s1", 3L) }
    assert(e.getMessage.contains("retention horizon"))
    // a committed batch dir going missing is refused, not silently skipped
    graft.util.Fs.deleteRecursively(
      java.nio.file.Paths.get(m.sinkPath("s1"), "batch=1"))
    val e2 = intercept[IllegalStateException] { m.streamSinkAsOf(spark, "s1", 5L) }
    assert(e2.getMessage.contains("partial data"))
  }

  test("crash-recovery re-sweep never double-counts compacted batches into the base") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-ret3").toString
    val m = new Manifest(out)
    def batch(ids: Seq[Int]) = ids
      .map(i => (s"conv-0000$i", i, "user", s"text $i", "t", new java.sql.Timestamp(i * 1000L), "s1"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
    (0 until 5).foreach(i => m.commitStreamBatch(batch(Seq(i + 1)), i.toLong))
    // simulate "crash AFTER the durable _retention.json write, BEFORE the
    // record deletes": snapshot record files survive the sweep
    val snapDir = java.nio.file.Paths.get(out, "_snapshots")
    val saved = graft.util.Fs.listDir(snapDir)
      .filter(_.getFileName.toString.startsWith("snap-"))
      .map(p => p.getFileName.toString -> Files.readString(p))
    assert(m.expireSnapshots(keepLast = 2) === Seq(1L, 2L, 3L))
    val base0 = m.retention().bases("s1")
    assert(base0 === Manifest.Retention.Base(2L, 3L))
    saved.foreach { case (name, body) =>
      val p = snapDir.resolve(name)
      if (!Files.exists(p)) Files.writeString(p, body)
    }
    // the recovery sweep re-expires the restored records — the base must be
    // UNCHANGED (batches <= maxBatch are already compacted), or every pinned
    // read for the sink fails its completeness check forever
    assert(m.expireSnapshots(keepLast = 2) === Seq(1L, 2L, 3L))
    assert(m.retention().bases("s1") === base0,
      "re-expiring already-compacted records must not inflate nBatches")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Int] =
      if (df.columns.isEmpty) Set.empty
      else df.select("turn_idx").collect().map(_.getInt(0)).toSet
    assert(ids(m.streamSinkAsOf(spark, "s1", 5L)) === Set(1, 2, 3, 4, 5))
  }

  test("a failed stream commit leaves no staged batch copy behind") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-leak").toString
    val m = new Manifest(out)
    val bad = Seq(("conv-1", 1, "user", "t", "t", new java.sql.Timestamp(1000L), "bad sink"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
    (1 to 3).foreach { i => // every foreachBatch retry stages a fresh UUID copy
      intercept[IllegalArgumentException] { m.commitStreamBatch(bad, i.toLong) }
    }
    val tmp = java.nio.file.Paths.get(out, "_tmp")
    val leaked =
      if (!Files.isDirectory(tmp)) Seq.empty
      else graft.util.Fs.listDir(tmp)
        .filter(_.getFileName.toString.startsWith("stream-batch-"))
    assert(leaked.isEmpty, s"staged copies must not outlive a failed commit: $leaked")
  }

  test("retention sweep never expires a sink's most-recent record (live-data provenance)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-ret2").toString
    val m = new Manifest(out)
    val rows = Seq(("conv-1", 1, "user", "t", "t", new java.sql.Timestamp(1000L), "alpha"))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink")
    m.writeAndCommit("alpha", rows, runId = "r1") // snapshot id 1 — alpha's only commit
    (0 until 5).foreach(i => m.appendSnapshot(sid =>
      s"""{"snapshot_id":$sid,"parent_id":${sid - 1},"run_id":"x$i","sink":"beta",""" +
        s""""op":"commit","row_count":0,"bytes":0,"convs":0,""" +
        s""""committed_ts":"2026-01-01T00:00:00Z"}"""))
    assert(m.currentSnapshotId() === 6L)
    // horizon 5: ids 1..4 qualify, but id 1 is alpha's latest → kept
    val expired = m.expireSnapshots(keepLast = 2)
    assert(expired === Seq(2L, 3L, 4L))
    val left = m.snapshots(spark).collect().map(_.getAs[Long]("snapshot_id")).toSet
    assert(left === Set(1L, 5L, 6L))
    assert(m.retention().horizon === 5L)
    assert(m.retention().bases.isEmpty, "batch commits never produce stream bases")
  }

  test("snapshot commit log: concurrent commits linearize, records never rewritten") {
    val out = Files.createTempDirectory("graft-snap").toString
    val m = new Manifest(out)
    // 8 concurrent committers race for snapshot ids — every claim must be
    // unique and the final log contiguous 1..8 (Iceberg-style optimistic
    // concurrency: losers retry against the new head, nothing is rewritten)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val claimed = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = m.appendSnapshot(sid =>
            s"""{"snapshot_id":$sid,"parent_id":${sid - 1},"run_id":"t$i",""" +
              s""""sink":"s$i","op":"commit","row_count":$i,"bytes":0,"convs":0,""" +
              s""""committed_ts":"2026-01-01T00:00:00Z"}""")
        })
      }.map(_.get())
      assert(claimed.toSet === (1L to 8L).toSet, s"ids not contiguous: $claimed")
    } finally pool.shutdown()
    assert(m.currentSnapshotId() === 8L)
    // each record's embedded snapshot_id matches its file name and parent
    // chain is linear — the linearized history
    val snaps = m.snapshots(spark).collect()
      .map(r => r.getAs[Long]("snapshot_id") -> r.getAs[Long]("parent_id")).toMap
    assert(snaps.keySet === (1L to 8L).toSet)
    (1L to 8L).foreach(id => assert(snaps(id) === id - 1))
    // a pipeline run appends to the log too, and sink pointers reference it
    Pipeline.run(spark, sfDir, out, runId = "rsnap")
    val entries = new Manifest(out).entries(spark)
      .filter(org.apache.spark.sql.functions.col("sink").isNotNull).collect()
    assert(entries.forall(_.getAs[Long]("snapshot_id") > 8L))
    assert(new Manifest(out).currentSnapshotId() === 8L + entries.length)
  }

  test("anti-join resume drops exactly the committed keys") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft-anti").toString
    Pipeline.run(spark, sfDir, out, runId = "r3", failAfterSinks = 2)
    val m = new Manifest(out)
    val turns = graft.model.Transcripts.fromEvents(spark, sfDir)
    val (routedAll, _) = Pipeline.route(turns, spark)
    val remaining = m.antiJoinResume(spark,
      routedAll.select("conv_id", "turn_idx", "role", "text", "tool", "ts", "sink"))
    val committedCount = m.committedSinks().toSeq
      .map(s => spark.read.parquet(m.sinkPath(s)).count()).sum
    assert(remaining.count() === routedAll.count() - committedCount)
    assert(remaining.filter(col("sink").isin(m.committedSinks().toSeq: _*)).count() === 0)
  }
}
