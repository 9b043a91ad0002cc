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
  *   GET /runs         → JSON array of per-run metrics (live counters)
  *   GET /healthz      → "ok"
  */
final class MetricsHttp(root: String, port: Int) {
  private val manifestDir = Paths.get(root, "_manifest")
  private var server: Option[HttpServer] = None

  private def listJson(filter: String => Boolean): String = {
    if (!Files.isDirectory(manifestDir)) return "[]"
    graft.util.Fs.listDir(manifestDir)
      .filter(p => filter(p.getFileName.toString))
      .sortBy(_.getFileName.toString)
      .map(p => Files.readString(p))
      .mkString("[", ",", "]")
  }

  private def handler(body: () => String): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val bytes = body().getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }

  /** Starts the server; returns the bound port (use port=0 for ephemeral). */
  def start(): Int = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/sinks",
      handler(() => listJson(n => n.endsWith(".json") && !n.startsWith("_"))))
    s.createContext("/runs",
      handler(() => listJson(n => n.startsWith("_metrics_") && n.endsWith(".json"))))
    s.createContext("/healthz", handler(() => "\"ok\""))
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
