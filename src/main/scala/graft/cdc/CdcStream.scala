package graft.cdc

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming MERGE sink — a live changelog stream maintained as a snapshot
  * table, the foreachBatch completion of [[Cdc.applyChangelog]].
  *
  * Every micro-batch of change rows produces the NEXT snapshot version as
  * an immutable directory `<root>/v=<batchId>` (apply the batch to the
  * latest previous version, write to a temp dir, one atomic rename). The
  * version chain is append-only, so:
  *   - replays are idempotent: an existing `v=<batchId>` short-circuits
  *     (foreachBatch re-delivers a failed batch with the same id and rows),
  *     and a crash mid-write leaves only a temp dir that the retry
  *     overwrites — kill/restart yields exactly the same final state;
  *   - time travel is free: any earlier version stays readable
  *     ([[CdcStream.version]]), the streaming twin of
  *     [[graft.manifest.Manifest.streamSinkAsOf]].
  *
  * Ordering semantics: batch arrival order is the outer order; `seqCol`
  * orders WITHIN a batch (the contract of every changelog consumer whose
  * upstream assigns batches monotonically). Old versions are retained
  * until [[vacuum]] prunes them past the time-travel horizon. */
object CdcStream {

  private def versionDirs(root: String): Seq[(Long, Path)] = {
    val base = Paths.get(root)
    if (!Files.isDirectory(base)) return Seq.empty
    graft.util.Fs.listDir(base)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("v="))
      .map(p => p.getFileName.toString.stripPrefix("v=").toLong -> p)
      .sortBy(_._1)
  }

  /** Snapshot as of version `id` (exact dir; analysis error if absent). */
  def version(spark: SparkSession, root: String, id: Long): DataFrame =
    spark.read.parquet(Paths.get(root, s"v=$id").toString)

  /** The latest committed snapshot, or None before the first batch. */
  def latest(spark: SparkSession, root: String): Option[DataFrame] =
    versionDirs(root).lastOption.map { case (_, p) => spark.read.parquet(p.toString) }

  /** The foreachBatch body. Usable directly for deterministic tests and
    * replay simulation; [[writer]] wires it to a stream. */
  def applyBatch(root: String, keys: Seq[String], seqCol: String, opCol: String)(
      changes: DataFrame, batchId: Long): Unit = {
    Files.createDirectories(Paths.get(root))
    val target = Paths.get(root, s"v=$batchId")
    if (Files.exists(target)) return // replay of a committed version
    val spark = changes.sparkSession
    val prev = versionDirs(root).takeWhile(_._1 < batchId).lastOption match {
      case Some((_, p)) => spark.read.parquet(p.toString)
      case None => changes.drop(opCol, seqCol).limit(0) // empty initial snapshot
    }
    val next = Cdc.applyChangelog(prev, changes, keys, seqCol, opCol)
    val tmp = Paths.get(root, s"_tmp-v$batchId")
    next.write.mode("overwrite").parquet(tmp.toString)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Retention sweep (the lakehouse VACUUM): delete all but the newest
    * `keepLast` committed versions, returning the ids removed. The latest
    * version is never deleted. Standard VACUUM contract: `keepLast` must
    * exceed every reader's time-travel horizon — a reader pinned past the
    * horizon fails fast on the missing directory rather than seeing partial
    * data. Temp dirs of in-flight writes (`_tmp-v*`) are untouched. */
  def vacuum(root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, s"keepLast out of range: $keepLast")
    val drop = versionDirs(root).dropRight(keepLast)
    drop.foreach { case (_, p) => graft.util.Fs.deleteRecursively(p) }
    drop.map(_._1)
  }

  /** Streaming writer: changelog stream → versioned snapshot table. */
  def writer(changes: DataFrame, root: String, checkpointDir: String,
      keys: Seq[String], seqCol: String, opCol: String) =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(applyBatch(root, keys, seqCol, opCol) _)
}
