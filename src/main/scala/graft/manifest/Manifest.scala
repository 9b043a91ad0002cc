package graft.manifest

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lineage/metrics manifest with write-then-commit semantics + idempotent resume.
  *
  * Reference analog: the Consul-KV dedup set keyed by event hash
  * (reference source/nomad/worker.go:114-127). The reference marks AFTER
  * emitting (emit-then-mark race, worker.go:149-154 ⇒ at-least-once); we
  * invert the order — sink data lands fully, then the manifest entry commits
  * atomically — so a rerun of a killed job produces zero duplicate routed
  * rows (north_rule: "resumes idempotently without duplicate routed rows").
  *
  * No Iceberg jar in the sandbox, so "Iceberg manifest" is realized as:
  *   <root>/sinks/<sink>/          committed sink parquet (atomic dir rename)
  *   <root>/_manifest/<sink>.json  commit record (atomic file move)
  * On a real cluster the same protocol maps onto Iceberg snapshot commits —
  * the unit of commit is a sink partition, the manifest is the catalog.
  *
  * Scale: resume skips committed sinks BEFORE the scan is planned (driver-side
  * manifest read), so a resumed run reads only the uncommitted remainder; the
  * per-row anti-join alternative (also provided, [[antiJoinResume]]) covers
  * finer-grained recovery where partial sink output must be reconciled.
  */
final class Manifest(root: String) {
  private val manifestDir = Paths.get(root, "_manifest")
  private val tmpDir = Paths.get(root, "_tmp")

  def committedSinks(): Set[String] = {
    if (!Files.isDirectory(manifestDir)) return Set.empty
    val s = Files.list(manifestDir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.startsWith("_"))
        .map(_.stripSuffix(".json"))
        .toSet
    } finally s.close()
  }

  def sinkPath(sink: String): String = s"$root/sinks/$sink"

  /** Write one sink's routed rows (date-partitioned, so downstream readers
    * get partition pruning on `dt` — the Iceberg-style layout), then commit
    * its manifest entry.
    * Ordering: data → fsync'd temp manifest → atomic move. A crash anywhere
    * before the move leaves the sink uncommitted; resume rewrites it
    * (overwrite mode makes the rewrite idempotent). */
  /** Target rows per output file — sized so a file is a few hundred MB of
    * transcript text at production row widths. */
  val TargetRowsPerFile: Long = 4L * 1024 * 1024

  def writeAndCommit(sink: String, rows: DataFrame, runId: String): Unit = {
    Files.createDirectories(manifestDir)
    Files.createDirectories(tmpDir)
    val stats = rows
      .agg(count(lit(1)).as("rows"),
        coalesce(sum(octet_length(col("text"))), lit(0L)).as("bytes"),
        coalesce(countDistinct(to_date(col("ts"))), lit(1L)).as("days"),
        countDistinct(col("conv_id")).as("convs"))
      .collect()(0)
    val days = math.max(1L, stats.getLong(2))
    // small-file control: cluster rows so each (dt, salt) lands in exactly one
    // task => ~filesPerDay files per date partition, instead of
    // tasks x dates tiny files (the classic partitionBy small-file explosion)
    val filesPerDay = math.max(1L,
      math.min(1024L, stats.getLong(0) / days / TargetRowsPerFile + 1)).toInt
    val nParts = math.max(1, math.min(8192L, days * filesPerDay).toInt)
    rows
      .withColumn("dt", to_date(col("ts")))
      .repartition(nParts, col("dt"),
        pmod(hash(col("conv_id"), col("turn_idx")), lit(filesPerDay)))
      .write.mode("overwrite").partitionBy("dt").parquet(sinkPath(sink))
    val entry =
      s"""{"run_id":"$runId","sink":"$sink","row_count":${stats.getLong(0)},""" +
        s""""bytes":${stats.getLong(1)},"convs":${stats.getLong(3)},""" +
        s""""committed_ts":"${java.time.Instant.now()}"}"""
    val tmp = tmpDir.resolve(s"$sink.json")
    Files.writeString(tmp, entry)
    Files.move(tmp, manifestDir.resolve(s"$sink.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The lineage/metrics records as a queryable DataFrame (reference analog:
    * the JSON monitoring API, web/api/targets.go:43-121 — here it's "plain
    * SQL over the manifest table", SURVEY.md §2.7 A4). */
  def entries(spark: SparkSession): DataFrame =
    spark.read.json(manifestDir.toString)

  /** Row-level resume: drop input rows whose (conv_id, turn_idx, sink) is
    * already present in committed sink output — a left ANTI join, the exact
    * Spark translation of the reference's dedup-KV lookup (F2, SURVEY.md §2.4). */
  def antiJoinResume(spark: SparkSession, routed: DataFrame): DataFrame = {
    val committed = committedSinks()
    if (committed.isEmpty) return routed
    val done = committed.toSeq
      .map(s => spark.read.parquet(sinkPath(s)).select(col("conv_id"), col("turn_idx"), col("sink")))
      .reduce(_ unionByName _)
    routed.join(done, Seq("conv_id", "turn_idx", "sink"), "left_anti")
  }
}
