package graft.manifest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal live-metrics HTTP surface over the manifest directory — the A4
  * analog of the reference's JSON monitoring API (web/api/api.go:8-14,
  * targets.go:43-121) and Prometheus endpoint (web/server.go:26-33).
  *
  * The engine's run state IS the manifest: per-sink commit entries
  * (rows/bytes/convs) plus the per-run `_metrics_*.json` counters that
  * [[graft.pipeline.Pipeline.run]] persists from the limiter's verdict cells
  * (in/out/dropped per sink). Serving them requires no running SparkSession
  * — the JDK's built-in HttpServer reads the JSON files on demand, so the
  * endpoint can outlive (or predate) any job, exactly like the reference's
  * sidecar web server.
  *
  * Routes:
  *   GET /sinks        → JSON array of committed-sink manifest entries
  *   GET /runs         → JSON array of per-run metrics (live counters,
  *                       incl. per-stage scan/parse/route rows)
  *   GET /snapshots    → JSON array of the append-only snapshot commit log
  *                       (post-sweep: expired records no longer appear)
  *   GET /retention    → expire-snapshots state: pinned-reader horizon +
  *                       per-sink compacted stream bases
  *   GET /metrics      → Prometheus text exposition of the same cells
  *   GET /cluster      → live executor roster + per-executor task/storage
  *                       stats from the SparkContext status tracker — the
  *                       analog of the reference's cluster view
  *                       (web/api/cluster.go:21-60); `?node=host:port`
  *                       narrows to one executor the way the reference's
  *                       `?node=` proxies a single node's stats. Requires
  *                       a live session (pass `spark`); absent one the
  *                       route reports the sidecar state.
  *   GET /healthz      → "ok"
  */
final class MetricsHttp(root: String, port: Int,
    spark: Option[org.apache.spark.sql.SparkSession] = None) {
  private val manifestDir = Paths.get(root, "_manifest")
  private val snapshotDir = Paths.get(root, "_snapshots")
  private var server: Option[HttpServer] = None

  private def listJson(filter: String => Boolean,
      dir: java.nio.file.Path = manifestDir): String = {
    if (!Files.isDirectory(dir)) return "[]"
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    graft.util.Fs.listDir(dir)
      .filter(p => filter(p.getFileName.toString))
      .sortBy(_.getFileName.toString)
      // skip mid-write/truncated files instead of corrupting the whole
      // array — on no-hard-link filesystems a snapshot's content no longer
      // appears atomically with its name (Manifest.appendSnapshot fallback)
      .flatMap { p =>
        val s = Files.readString(p)
        try { om.readTree(s); Some(s) }
        catch { case scala.util.control.NonFatal(_) => None }
      }
      .mkString("[", ",", "]")
  }

  /** Single response writer shared by every route. */
  private def respond(ex: HttpExchange, code: Int, payload: String, ct: String): Unit = {
    val bytes = payload.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", ct)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** A monitoring sidecar degrades, it never drops connections: every route
    * funnels through this — a body() failure is a 500 with a JSON error,
    * not an unanswered exchange (client-side connection reset). */
  private def handler(body: () => String,
      contentType: String = "application/json"): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val (code, payload, ct) =
          try (200, body(), contentType)
          catch { case e: Exception =>
            (500, s"""{"error":${jsonString(e.toString)}}""", "application/json") }
        respond(ex, code, payload, ct)
      } finally ex.close()
  }

  private def jsonFiles(filter: String => Boolean): Seq[com.fasterxml.jackson.databind.JsonNode] = {
    if (!Files.isDirectory(manifestDir)) return Seq.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    graft.util.Fs.listDir(manifestDir)
      .filter(p => filter(p.getFileName.toString))
      .sortBy(_.getFileName.toString)
      // a live scraper must not crash on a file another process is mid-write
      // or left truncated by a crash — skip what doesn't parse, serve the rest
      .flatMap(p =>
        try Some(om.readTree(Files.readString(p)))
        catch { case scala.util.control.NonFatal(_) => None })
  }

  /** Prometheus text exposition (version 0.0.4) over the same manifest cells
    * — the reference serves /metrics via promhttp (web/server.go:32; counters
    * registered in monitoring/stats.go:10-118). Committed-sink entries become
    * per-sink totals; the per-run in/out/dropped limiter counters and stage
    * counters are summed across runs (monotone, counter semantics). */
  private def prometheusBody(): String = {
    val sb = new StringBuilder
    // exposition-format label escaping: backslash, quote, newline
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    def metric(name: String, help: String, mType: String,
        rows: Seq[(String, Long)], label: String): Unit = {
      if (rows.nonEmpty) {
        sb ++= s"# HELP $name $help\n# TYPE $name $mType\n"
        rows.foreach { case (k, v) => sb ++= s"""$name{$label="${esc(k)}"} $v""" + "\n" }
      }
    }
    def counter(name: String, help: String,
        rows: Seq[(String, Long)], label: String = "sink"): Unit =
      metric(name, help, "counter", rows, label)
    val entries = jsonFiles(n => n.endsWith(".json") && !n.startsWith("_"))
    counter("graft_sink_rows_total", "Rows committed per sink",
      entries.map(e => e.get("sink").asText -> e.get("row_count").asLong))
    counter("graft_sink_bytes_total", "Text bytes committed per sink",
      entries.map(e => e.get("sink").asText -> e.get("bytes").asLong))
    // gauge, not counter: a re-committed sink re-counts its distinct convs,
    // so the value can legitimately decrease
    metric("graft_sink_convs", "Distinct conversations committed per sink",
      "gauge", entries.map(e => e.get("sink").asText -> e.get("convs").asLong), "sink")

    val runs = jsonFiles(n => n.startsWith("_metrics_") && n.endsWith(".json"))
    sb ++= s"# HELP graft_runs_total Completed pipeline runs\n" +
      s"# TYPE graft_runs_total counter\ngraft_runs_total ${runs.size}\n"
    // per-sink limiter counters summed across runs
    val perSink = scala.collection.mutable.SortedMap[String, Array[Long]]()
    val fields = Seq("in_rows", "in_bytes", "out_rows", "out_bytes",
      "dropped_rows", "dropped_bytes")
    runs.foreach { r =>
      val ps = r.get("per_sink")
      if (ps != null) ps.properties().forEach { e =>
        val acc = perSink.getOrElseUpdate(e.getKey, new Array[Long](fields.size))
        fields.zipWithIndex.foreach { case (f, i) =>
          // a run file from an older build may lack a field — scrape the rest
          acc(i) += Option(e.getValue.get(f)).map(_.asLong).getOrElse(0L) }
      }
    }
    fields.zipWithIndex.foreach { case (f, i) =>
      counter(s"graft_sink_${f}_total", s"Limiter-observed $f per sink across runs",
        perSink.toSeq.map { case (s, a) => s -> a(i) })
    }
    // per-stage counters summed across runs
    val stages = scala.collection.mutable.SortedMap[String, Long]()
    runs.foreach { r =>
      val st = r.get("stages")
      if (st != null) st.properties().forEach { e =>
        e.getValue.properties().forEach { f =>
          val k = s"${e.getKey}_${f.getKey}"
          stages(k) = stages.getOrElse(k, 0L) + f.getValue.asLong
        }
      }
    }
    counter("graft_stage_rows_total", "Per-stage observed counters across runs",
      stages.toSeq, label = "stage")
    sb.result()
  }

  /** Query-param-aware handler (the plain one ignores the request URI). */
  /** Query-param-aware [[handler]]: a malformed query string (bad
    * percent-encoding → URLDecoder throws) is a 400, body() failures a 500. */
  private def paramHandler(body: Map[String, String] => String,
      contentType: String = "application/json"): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val status =
          try Right(
            Option(ex.getRequestURI.getQuery).getOrElse("")
              .split("&").filter(_.contains("=")).map { kv =>
                val Array(k, v) = kv.split("=", 2)
                k -> java.net.URLDecoder.decode(v, "UTF-8")
              }.toMap)
          catch { case e: IllegalArgumentException => Left(400 -> e.getMessage) }
        val (code, payload, ct) = status match {
          case Right(params) =>
            try (200, body(params), contentType)
            catch { case e: Exception =>
              (500, s"""{"error":${jsonString(e.toString)}}""", "application/json") }
          case Left((code, msg)) =>
            (code, s"""{"error":${jsonString(s"bad query string: $msg")}}""",
              "application/json")
        }
        respond(ex, code, payload, ct)
      } finally ex.close()
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Live executor roster + per-executor task/storage stats — the cluster
    * view. In Spark the "nodes" the reference proxies with `?node=` are the
    * executors, and the driver's status tracker already aggregates their
    * heartbeats, so this is a read, not a fan-out of HTTP calls. */
  private def clusterBody(params: Map[String, String]): String = spark match {
    case None =>
      """{"mode":"sidecar","error":"no live SparkSession attached","executors":[]}"""
    case Some(s) =>
      val st = s.sparkContext.statusTracker
      val node = params.get("node")
      val execs = st.getExecutorInfos.toSeq
        .map(e => (s"${e.host}:${e.port}", e))
        .filter { case (id, _) => node.forall(_ == id) }
        .map { case (id, e) =>
          s"""{"node":"$id","running_tasks":${e.numRunningTasks()},""" +
            s""""cache_size":${e.cacheSize()},""" +
            s""""used_onheap_storage":${e.usedOnHeapStorageMemory()},""" +
            s""""used_offheap_storage":${e.usedOffHeapStorageMemory()},""" +
            s""""total_onheap_storage":${e.totalOnHeapStorageMemory()},""" +
            s""""total_offheap_storage":${e.totalOffHeapStorageMemory()}}"""
        }
      s"""{"mode":"live","executors":[${execs.mkString(",")}],""" +
        s""""default_parallelism":${s.sparkContext.defaultParallelism},""" +
        s""""active_jobs":${st.getActiveJobIds().mkString("[", ",", "]")},""" +
        s""""active_stages":${st.getActiveStageIds().mkString("[", ",", "]")}}"""
  }

  private def htmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Server-rendered status page — the lightweight stand-in for the
    * reference's web UI (web/ui): one HTML document over the same manifest
    * cells and live roster the JSON routes serve, no scripts, rendered
    * per request so it is always current. Anything but "/" under the root
    * context is a 404 (the JDK server routes unmatched paths here). */
  private def indexBody(): String = {
    val entries = jsonFiles(n => n.endsWith(".json") && !n.startsWith("_"))
    val runs = jsonFiles(n => n.startsWith("_metrics_") && n.endsWith(".json"))
    val sinkRows = entries.map { e =>
      s"<tr><td>${htmlEsc(e.get("sink").asText)}</td>" +
        s"<td>${e.get("row_count").asLong}</td><td>${e.get("bytes").asLong}</td>" +
        s"<td>${e.get("convs").asLong}</td></tr>"
    }.mkString
    val execRows = spark.toSeq.flatMap { s =>
      s.sparkContext.statusTracker.getExecutorInfos.toSeq.map { e =>
        s"<tr><td>${htmlEsc(e.host)}:${e.port}</td><td>${e.numRunningTasks()}</td>" +
          s"<td>${e.cacheSize()}</td></tr>"
      }
    }.mkString
    val clusterSection =
      if (spark.isDefined)
        s"""<h2>Executors</h2><table border="1" cellpadding="4">
           |<tr><th>node</th><th>running tasks</th><th>cache bytes</th></tr>$execRows</table>"""
          .stripMargin
      else "<h2>Executors</h2><p>sidecar mode — no live session</p>"
    s"""<!doctype html><html><head><title>graft status</title></head><body>
       |<h1>graft pipeline status</h1>
       |<p>${entries.size} committed sinks · ${runs.size} recorded runs ·
       |<a href="/sinks">sinks</a> · <a href="/runs">runs</a> ·
       |<a href="/snapshots">snapshots</a> · <a href="/retention">retention</a> ·
       |<a href="/metrics">metrics</a> ·
       |<a href="/cluster">cluster</a> · <a href="/healthz">healthz</a></p>
       |<h2>Committed sinks</h2><table border="1" cellpadding="4">
       |<tr><th>sink</th><th>rows</th><th>bytes</th><th>convs</th></tr>$sinkRows</table>
       |$clusterSection
       |</body></html>""".stripMargin
  }

  /** Starts the server; returns the bound port (use port=0 for ephemeral). */
  def start(): Int = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          val (code, payload, ct) =
            if (ex.getRequestURI.getPath == "/")
              try (200, indexBody(), "text/html; charset=utf-8")
              catch { case e: Exception =>
                (500, s"""{"error":${jsonString(e.toString)}}""", "application/json") }
            else (404, """{"error":"not found"}""", "application/json")
          respond(ex, code, payload, ct)
        } finally ex.close()
    })
    s.createContext("/sinks",
      handler(() => listJson(n => n.endsWith(".json") && !n.startsWith("_"))))
    s.createContext("/runs",
      handler(() => listJson(n => n.startsWith("_metrics_") && n.endsWith(".json"))))
    s.createContext("/healthz", handler(() => "\"ok\""))
    s.createContext("/snapshots",
      handler(() => listJson(n => n.startsWith("snap-") && n.endsWith(".json"),
        dir = snapshotDir)))
    // the expire-snapshots state: the horizon below which pinned reads fail
    // fast, and the per-sink compacted bases (Manifest.expireSnapshots)
    s.createContext("/retention", handler { () =>
      val p = snapshotDir.resolve("_retention.json")
      if (Files.exists(p)) Files.readString(p)
      else """{"horizon":0,"bases":{}}"""
    })
    s.createContext("/metrics",
      handler(() => prometheusBody(), contentType = "text/plain; version=0.0.4"))
    s.createContext("/cluster", paramHandler(clusterBody))
    s.setExecutor(null) // single-threaded: a monitoring sidecar, not a data path
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = {
    server.foreach(_.stop(0))
    server = None
  }
}
