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
  *   <root>/sinks/<sink>/              committed sink parquet (atomic dir rename)
  *   <root>/_manifest/<sink>.json      current-pointer view (atomic file move)
  *   <root>/_snapshots/snap-NNN.json   append-only numbered commit log
  *                                     ([[appendSnapshot]] — optimistic
  *                                     concurrency, records never rewritten)
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
  private val snapshotDir = Paths.get(root, "_snapshots")
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
    commitEntry(sink, runId, stats.getLong(0), stats.getLong(1), stats.getLong(3))
  }

  /** Commit a sink whose data was already staged by the single-pass limiter
    * ([[graft.limit.SinglePassLimit]]): the staged partition directory is
    * PROMOTED into place with one atomic rename — no row is rewritten — then
    * the manifest entry commits. A stale uncommitted target (crash between a
    * previous promote and its commit) is replaced. */
  def promoteAndCommit(sink: String, stagedDir: java.nio.file.Path, runId: String,
      rows: Long, bytes: Long, convs: Long): Unit = {
    Files.createDirectories(manifestDir)
    Files.createDirectories(tmpDir)
    val target = Paths.get(sinkPath(sink))
    if (Files.exists(target)) deleteRecursively(target)
    Files.createDirectories(target.getParent)
    Files.move(stagedDir, target, StandardCopyOption.ATOMIC_MOVE)
    commitEntry(sink, runId, rows, bytes, convs)
  }

  private def commitEntry(sink: String, runId: String, rows: Long, bytes: Long,
      convs: Long): Unit = {
    val snap = appendSnapshot(sid => snapshotRecord(sid, sink, runId, rows, bytes, convs))
    val entry =
      s"""{"run_id":"$runId","sink":"$sink","row_count":$rows,""" +
        s""""bytes":$bytes,"convs":$convs,"snapshot_id":$snap,""" +
        s""""committed_ts":"${java.time.Instant.now()}"}"""
    val tmp = tmpDir.resolve(s"$sink.json")
    Files.writeString(tmp, entry)
    Files.move(tmp, manifestDir.resolve(s"$sink.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def snapshotRecord(snapshotId: Long, sink: String, runId: String,
      rows: Long, bytes: Long, convs: Long): String =
    s"""{"snapshot_id":$snapshotId,"parent_id":${snapshotId - 1},""" +
      s""""run_id":"$runId","sink":"$sink","op":"commit","row_count":$rows,""" +
      s""""bytes":$bytes,"convs":$convs,""" +
      s""""committed_ts":"${java.time.Instant.now()}"}"""

  /** Append-only, snapshot-numbered commit log — the Iceberg-shaped half of
    * the manifest. Each commit claims snapshot N+1 by ATOMICALLY hard-linking
    * a fully-written temp record to `snap-<N+1>.json`; link creation fails if
    * the name exists (EEXIST), so two concurrent committers can never claim
    * the same snapshot — the loser re-reads the head and retries against
    * N+2, exactly Iceberg's optimistic-concurrency commit protocol (on a real
    * cluster the same loop runs against the catalog's compare-and-swap).
    * Records are never rewritten; `<sink>.json` stays the current-pointer
    * VIEW, derivable as "latest snapshot per sink".
    *
    * @param record builds the record body for a CANDIDATE snapshot id (the
    *        id lands inside the record, so it is re-rendered per attempt)
    * @return the claimed snapshot id */
  def appendSnapshot(record: Long => String): Long = {
    Files.createDirectories(snapshotDir)
    Files.createDirectories(tmpDir)
    var attempt = currentSnapshotId() + 1
    while (true) {
      val tmp = tmpDir.resolve(s"snap-$attempt-${java.util.UUID.randomUUID()}.json")
      Files.writeString(tmp, record(attempt))
      val target = snapshotDir.resolve(f"snap-$attempt%08d.json")
      try {
        try Files.createLink(target, tmp)
        catch {
          case e: java.nio.file.FileAlreadyExistsException => throw e
          // no hard links on this filesystem. Two ways that surfaces: a
          // provider that doesn't implement createLink at all throws
          // UnsupportedOperationException; the default unix provider on an
          // overlay/FUSE/object-store mount surfaces EPERM/ENOTSUP as a
          // generic FileSystemException with the target absent (when the
          // target EXISTS it's a platform's EEXIST spelling — a lost race,
          // handled by the outer catch).
          case e: Exception if e.isInstanceOf[UnsupportedOperationException] ||
              (e.isInstanceOf[java.nio.file.FileSystemException] &&
                !Files.exists(target)) =>
            // CREATE_NEW is the same atomic fail-if-exists CLAIM, but the
            // content no longer appears atomically with it — so write fully
            // (looped: one channel write is not contracted to drain the
            // buffer) and delete OUR partial claim on any failure, instead
            // of leaving a truncated record permanently committed
            val ch = Files.newByteChannel(target,
              java.nio.file.StandardOpenOption.WRITE,
              java.nio.file.StandardOpenOption.CREATE_NEW)
            try {
              val buf = java.nio.ByteBuffer.wrap(Files.readAllBytes(tmp))
              try { while (buf.hasRemaining) ch.write(buf) } finally ch.close()
            } catch {
              case w: Throwable =>
                try Files.deleteIfExists(target)
                catch { case _: Throwable => () }
                throw w
            }
        }
        Files.delete(tmp)
        return attempt
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.delete(tmp)
          attempt = math.max(attempt + 1, currentSnapshotId() + 1)
        // some platforms surface EEXIST as a generic FileSystemException —
        // re-check the target before deciding crash vs lost-race
        case e: java.nio.file.FileSystemException if Files.exists(target) =>
          Files.delete(tmp)
          attempt = math.max(attempt + 1, currentSnapshotId() + 1)
      }
    }
    -1L // unreachable
  }

  /** Highest committed snapshot id (0 when the log is empty). */
  def currentSnapshotId(): Long = {
    if (!Files.isDirectory(snapshotDir)) return 0L
    graft.util.Fs.listDir(snapshotDir)
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("snap-") && n.endsWith(".json") =>
        n.stripPrefix("snap-").stripSuffix(".json").toLong }
      .foldLeft(0L)(math.max)
  }

  /** The snapshot log as a DataFrame (time travel / audit: every commit ever
    * made, in order — `<sink>.json` current pointers are its projection).
    * An empty log reads as an empty DataFrame with the record schema, like
    * every sibling accessor (committedSinks/currentSnapshotId on a fresh
    * root), not a PATH_NOT_FOUND error. */
  def snapshots(spark: SparkSession): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "snapshot_id LONG, parent_id LONG, run_id STRING, sink STRING, " +
        "op STRING, row_count LONG, bytes LONG, convs LONG, committed_ts STRING")
    if (!Files.isDirectory(snapshotDir))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(snapshotDir.toString)
  }

  // ---- retention (the expire-snapshots half of the lakehouse contract) ----

  import Manifest.Retention

  private def retentionPath = snapshotDir.resolve("_retention.json")

  /** Current retention state (underscore-prefixed, so it is invisible to the
    * path-based snapshot readers and [[snapshots]]). */
  def retention(): Retention = {
    if (!Files.exists(retentionPath)) return Retention.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = om.readTree(Files.readString(retentionPath))
    import scala.jdk.CollectionConverters._
    val bases = Option(n.get("bases")).map { b =>
      b.properties().asScala.map { e =>
        e.getKey -> Retention.Base(
          e.getValue.get("max_batch").asLong, e.getValue.get("n_batches").asLong)
      }.toMap
    }.getOrElse(Map.empty[String, Retention.Base])
    Retention(n.get("horizon").asLong, bases)
  }

  /** Retention sweep over the append-only snapshot log — the batch-side
    * analog of [[graft.cdc.CdcStream.vacuum]] (Iceberg's expireSnapshots):
    * without it the log grows one record per commit forever. Keeps the
    * newest `keepLast` records; older records are deleted, EXCEPT each
    * sink's most-recent record (the provenance of live data is never lost —
    * the same rule that makes Iceberg never expire the current snapshot).
    *
    * Expired stream-commit records are first COMPACTED into the per-sink
    * base ([[Retention.Base]]): their batch directories are all older than
    * any retained record's (per-sink batch ids and snapshot ids are both
    * monotone), so "batch dirs with id <= maxBatch" reconstructs exactly the
    * expired prefix — [[streamSinkAsOf]] stays exact for every servable pin.
    * The horizon is monotone and durable, and is persisted ATOMICALLY BEFORE
    * any record file is deleted: a crash mid-sweep leaves extra records
    * (harmless — compaction is a union and re-expiry is idempotent), never
    * a horizon that promises more than the log can serve.
    *
    * Pinned-reader contract: a [[streamSinkAsOf]] read with
    * `snapshotId < horizon` FAILS FAST ([[IllegalStateException]]) — it can
    * no longer be reconstructed record-by-record and partial data is never
    * returned. Size `keepLast` above every reader's pin age, exactly the
    * [[graft.cdc.CdcStream.vacuum]] `keepLast` contract.
    *
    * @return the snapshot ids expired by THIS sweep */
  def expireSnapshots(keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast out of range: $keepLast")
    if (!Files.isDirectory(snapshotDir)) return Seq.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // (id, sink, op, batchId) per parseable record — mid-write records are
    // skipped like every other log reader here
    val records = graft.util.Fs.listDir(snapshotDir)
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("snap-") && n.endsWith(".json")
      }
      .flatMap { p =>
        try {
          val n = om.readTree(Files.readString(p))
          val batch =
            if (n.hasNonNull("op") && n.get("op").asText == "stream_commit")
              Some(n.get("run_id").asText.stripPrefix("stream-batch-").toLong)
            else None
          Some((n.get("snapshot_id").asLong,
            if (n.hasNonNull("sink")) n.get("sink").asText else "",
            batch, p))
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    if (records.isEmpty) return Seq.empty
    val prev = retention()
    val head = records.map(_._1).max
    val horizon = math.max(prev.horizon, head - keepLast + 1)
    val latestPerSink = records.groupBy(_._2).view.mapValues(_.map(_._1).max).toMap
    val expire = records.filter { case (id, sink, _, _) =>
      id < horizon && id != latestPerSink(sink)
    }
    // Fold in ascending batch order and skip batches at or below the sink's
    // recorded maxBatch: a crash AFTER the durable write but BEFORE the
    // record deletes leaves already-compacted records on disk, and the next
    // sweep re-expires them — counting those again would inflate nBatches
    // past the real dir count and permanently fail streamSinkAsOf's
    // completeness check. Per-sink batch ids are monotone, so
    // batch <= maxBatch ⇔ already compacted (this is what makes re-expiry
    // actually idempotent, as the scaladoc promises).
    val bases = expire.sortBy(_._3.getOrElse(-1L)).foldLeft(prev.bases) {
      case (acc, (_, sink, Some(batch), _)) =>
        val b = acc.getOrElse(sink, Retention.Base(-1L, 0L))
        if (batch <= b.maxBatch) acc
        else acc.updated(sink, Retention.Base(batch, b.nBatches + 1))
      case (acc, _) => acc
    }
    // durable state FIRST (atomic replace), record deletes after
    val body = s"""{"horizon":$horizon,"bases":{""" +
      bases.toSeq.sortBy(_._1).map { case (s, b) =>
        s""""$s":{"max_batch":${b.maxBatch},"n_batches":${b.nBatches}}"""
      }.mkString(",") + "}}"
    Files.createDirectories(tmpDir)
    val tmp = tmpDir.resolve(s"_retention-${java.util.UUID.randomUUID()}.json")
    Files.writeString(tmp, body)
    Files.move(tmp, retentionPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    expire.foreach { case (_, _, _, p) => Files.deleteIfExists(p) }
    expire.map(_._1).sorted
  }

  // ---- streaming micro-batch commit (exactly-once across replays) ----

  /** Commit one routed micro-batch into per-sink committed parquet — the
    * PRODUCTION streaming sink path (driven by foreachBatch,
    * [[graft.streaming.StreamingPipeline.foreachBatchSink]]).
    *
    * Layout: `sinks/<sink>/batch=<id>/…` — append semantics at sink
    * granularity, one partition dir per micro-batch, readable by the same
    * path-based reads as the batch layout ([[sinkRows]]).
    *
    * Exactly-once: foreachBatch re-delivers a failed micro-batch with the
    * SAME batchId and (file source + checkpoint) the same rows, so the data
    * path only needs idempotent promotion — each sink's batch dir is staged
    * fully, then moved into place atomically, and a replay skips any
    * `batch=<id>` dir that already exists. A crash mid-commit (some sinks
    * promoted, some not) resumes by promoting exactly the missing ones: no
    * routed row is ever written twice (the north-rule resume invariant,
    * streaming edition). The snapshot audit log gets exactly one record per
    * (sink, batch): each record is appended immediately after its sink's
    * promotion, and a replay that meets an already-promoted target appends
    * the record only if the previous attempt died inside that sink's
    * move→append window ([[streamAuditedSinks]]) — neither lost nor
    * duplicated audit rows. A fully-committed batch short-circuits on its
    * marker file. */
  def commitStreamBatch(batch: DataFrame, batchId: Long): Unit = {
    Files.createDirectories(manifestDir)
    Files.createDirectories(tmpDir)
    val marker = manifestDir.resolve(s"_stream_batch_$batchId.json")
    if (Files.exists(marker)) return // replay of a fully-committed batch
    val spark = batch.sparkSession
    // stage the WHOLE batch once, partitioned by sink (one job, no per-sink
    // re-filtering of the batch plan)
    val staging = tmpDir.resolve(s"stream-batch-$batchId-${java.util.UUID.randomUUID()}")
    batch.write.mode("overwrite").partitionBy("sink").parquet(staging.toString)
    // the staged copy must not outlive this attempt: a failure below (bad
    // sink name, stats job, promote) is retried by foreachBatch with a FRESH
    // staging UUID, so a leaked dir is one full batch copy per retry until
    // the volume fills — hence the try/finally around the promote phase
    def promoteStaged(): Int = {
      val sinkDirs = graft.util.Fs.listDir(staging)
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("sink="))
      // ALL sinks' stats in ONE job over the partitioned staging root (the
      // earlier per-sink aggregates paid one driver job round-trip per sink
      // per micro-batch — scheduling overhead dominates tiny frequent batches).
      // The staging read pins the BATCH's schema: without it the sink partition
      // column comes back type-INFERRED from the directory names (an
      // all-numeric sink reads as int and getString throws).
      val stagedStats = spark.read.schema(batch.schema).parquet(staging.toString)
        .groupBy(col("sink"))
        .agg(count(lit(1)).as("rows"),
          coalesce(sum(octet_length(col("text"))), lit(0L)).as("bytes"),
          countDistinct(col("conv_id")).as("convs"))
        .collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0)) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // sink names become partition DIRECTORY names and later sinkPath()
      // segments, and the promote loop matches dir names back to the column
      // values above — a null sink (__HIVE_DEFAULT_PARTITION__) or one Spark
      // partition-escapes (space, '/', ':', '%') would break that round trip
      // and commit a dir no reader resolves. Enforce the identifier contract
      // up front, naming the offender, before anything is promoted.
      stagedStats.keys.foreach { sink =>
        require(sink != null && sink.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"),
          s"sink name must be a [A-Za-z0-9_.-]+ identifier, got: ${Option(sink).getOrElse("null")}")
      }
      // replay recovery: sinks whose audit record already reached the log (a
      // crash can land between a sink's move and its append — only consulted
      // when a replay actually meets an already-promoted target)
      lazy val alreadyLogged = streamAuditedSinks(batchId)
      var appended = 0
      sinkDirs.foreach { dir =>
        val sink = dir.getFileName.toString.stripPrefix("sink=")
        val target = Paths.get(sinkPath(sink), s"batch=$batchId")
        val promoted =
          if (!Files.exists(target)) {
            Files.createDirectories(target.getParent)
            Files.move(dir, target, StandardCopyOption.ATOMIC_MOVE)
            true
          } else false // replay — already promoted by a previous attempt
        // audit record appended immediately after THIS sink's promotion (not
        // after all of them), and re-appended on replay if the previous attempt
        // died in the move→append window; foreachBatch replays a batch with
        // identical content, so the staged stats equal the promoted dir's
        if (promoted || !alreadyLogged(sink)) {
          val (rows, bytes, convs) = stagedStats(sink)
          appendSnapshot(sid => streamSnapshotRecord(sid, sink, batchId, rows, bytes, convs))
          appended += 1
        }
      }
      appended
    }
    val appended = try promoteStaged() finally deleteRecursively(staging)
    val tmpMarker = tmpDir.resolve(s"_stream_batch_$batchId-${java.util.UUID.randomUUID()}.json")
    Files.writeString(tmpMarker,
      s"""{"batch_id":$batchId,"sinks":$appended,""" +
        s""""committed_ts":"${java.time.Instant.now()}"}""")
    Files.move(tmpMarker, marker,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Sinks with a committed-stream audit record for `batchId` — the replay
    * recovery read; tolerant of mid-write records like every log reader. */
  private def streamAuditedSinks(batchId: Long): Set[String] = {
    if (!Files.isDirectory(snapshotDir)) return Set.empty
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val runId = s"stream-batch-$batchId"
    graft.util.Fs.listDir(snapshotDir)
      .filter(_.getFileName.toString.startsWith("snap-"))
      .flatMap { p =>
        try {
          val n = om.readTree(Files.readString(p))
          if (n.hasNonNull("run_id") && n.get("run_id").asText == runId &&
            n.hasNonNull("sink")) Some(n.get("sink").asText)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }.toSet
  }

  private def streamSnapshotRecord(snapshotId: Long, sink: String, batchId: Long,
      rows: Long, bytes: Long, convs: Long): String =
    s"""{"snapshot_id":$snapshotId,"parent_id":${snapshotId - 1},""" +
      s""""run_id":"stream-batch-$batchId","sink":"$sink","op":"stream_commit",""" +
      s""""row_count":$rows,"bytes":$bytes,"convs":$convs,""" +
      s""""committed_ts":"${java.time.Instant.now()}"}"""

  /** Snapshot-isolation (time-travel) read over a STREAMING sink: only the
    * batch directories whose stream-commit audit record has
    * `snapshot_id <= snapshotId` — "the table as of snapshot N". Gives
    * repeatable reads while the stream keeps appending (pin
    * [[currentSnapshotId]] once, read the same data forever after) and
    * point-in-time debugging, the lakehouse table-version read. Batch
    * (overwrite-per-run) sinks have no version chain — their history is the
    * run id — so this is streaming-only by design. Returns an empty
    * zero-column frame when no batch qualifies.
    *
    * Retention interaction ([[expireSnapshots]]): a pin BELOW the horizon
    * fails fast — its record set no longer exists, and a partial answer is
    * never returned. A servable pin reconstructs the expired prefix from the
    * per-sink base (all `batch=` dirs with id <= base.maxBatch, verified
    * COMPLETE against the expired-record count) plus the retained records at
    * or below the pin; any missing batch directory fails fast the same way. */
  def streamSinkAsOf(spark: SparkSession, sink: String, snapshotId: Long): DataFrame = {
    val ret = retention()
    if (snapshotId < ret.horizon)
      throw new IllegalStateException(
        s"streamSinkAsOf($sink, $snapshotId): pin is below the retention horizon " +
          s"${ret.horizon} — its audit records were expired by expireSnapshots and " +
          "the read cannot be served without risking partial data; size keepLast " +
          "above every reader's pin age")
    if (!Files.isDirectory(snapshotDir)) return spark.emptyDataFrame
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val liveIds = graft.util.Fs.listDir(snapshotDir)
      .filter(_.getFileName.toString.startsWith("snap-"))
      .flatMap { p =>
        try {
          val n = om.readTree(Files.readString(p))
          if (n.hasNonNull("op") && n.get("op").asText == "stream_commit" &&
            n.hasNonNull("sink") && n.get("sink").asText == sink &&
            n.get("snapshot_id").asLong <= snapshotId)
            Some(n.get("run_id").asText.stripPrefix("stream-batch-").toLong)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }.distinct
    // expired prefix: every batch dir at or below the compacted base — the
    // dirs themselves are the record of what the expired records committed
    val base = ret.bases.get(sink)
    val baseIds = base.map { b =>
      val sinkDir = Paths.get(sinkPath(sink))
      val found =
        if (!Files.isDirectory(sinkDir)) Seq.empty[Long]
        else graft.util.Fs.listDir(sinkDir)
          .map(_.getFileName.toString)
          .collect { case n if n.startsWith("batch=") =>
            n.stripPrefix("batch=").toLong }
          .filter(_ <= b.maxBatch)
      if (found.size != b.nBatches)
        throw new IllegalStateException(
          s"streamSinkAsOf($sink, $snapshotId): the expired prefix should hold " +
            s"${b.nBatches} batch dirs up to batch=${b.maxBatch} but ${found.size} " +
            "exist — refusing to return partial data")
      found
    }.getOrElse(Seq.empty)
    val batchIds = (baseIds ++ liveIds).distinct.sorted
    val paths = batchIds.map { b =>
      val p = Paths.get(sinkPath(sink), s"batch=$b")
      if (!Files.isDirectory(p))
        throw new IllegalStateException(
          s"streamSinkAsOf($sink, $snapshotId): committed batch dir $p is missing " +
            "— refusing to return partial data")
      p.toString
    }
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }

  /** Sinks with at least one committed streaming batch. */
  def streamCommittedSinks(): Set[String] = {
    val base = Paths.get(root, "sinks")
    if (!Files.isDirectory(base)) return Set.empty
    graft.util.Fs.listDir(base)
      .filter(p => Files.isDirectory(p) &&
        graft.util.Fs.listDir(p).exists(_.getFileName.toString.startsWith("batch=")))
      .map(_.getFileName.toString).toSet
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.util.Fs.deleteRecursively(p)

  /** One committed sink's rows WITH the sink column restored — promoted
    * directories carry the sink only in the path (it was a partition column
    * in staging), while writeAndCommit-written sinks carry it as data; this
    * normalizes both layouts. */
  def sinkRows(spark: SparkSession, sink: String): DataFrame =
    spark.read.parquet(sinkPath(sink)).withColumn("sink", lit(sink))

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
      .map(s => sinkRows(spark, s).select(col("conv_id"), col("turn_idx"), col("sink")))
      .reduce(_ unionByName _)
    routed.join(done, Seq("conv_id", "turn_idx", "sink"), "left_anti")
  }
}

object Manifest {
  /** Durable retention state ([[Manifest.expireSnapshots]]). `horizon` is
    * the lowest snapshot id still servable by pinned readers (0 = nothing
    * expired); `bases` compacts the expired stream-commit records per sink —
    * `maxBatch` the highest batch id whose audit record was expired,
    * `nBatches` how many were (so a reader can verify the corresponding data
    * dirs are COMPLETE, not merely present). */
  final case class Retention(horizon: Long, bases: Map[String, Retention.Base])
  object Retention {
    final case class Base(maxBatch: Long, nBatches: Long)
    val empty: Retention = Retention(0L, Map.empty)
  }
}
