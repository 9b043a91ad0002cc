package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping — the stats manifest that makes [[ZOrder]] pay
  * off at read time. Writing a clustered layout shrinks every file's
  * per-column bounding box; this module RECORDS those boxes (one manifest
  * row per file: row count + min/max per indexed column) and answers range
  * predicates by opening only the files whose box intersects — the
  * Iceberg/Delta manifest-pruning story, over plain parquet dirs.
  *
  * Why not lean on parquet footer statistics alone? Footer pruning happens
  * AFTER every file is listed and opened; at 100 TB / 100 k files a point
  * query pays 100 k footer reads before skipping anything. The manifest
  * costs one small parquet read, and on a z-ordered layout a 2-D box
  * predicate keeps O(√files) of them.
  *
  * The pruned file list materializes on the driver — by design, and
  * bounded: one row per FILE (the granularity Iceberg manifests and Delta
  * add-file logs also hold driver-side), not per row. 100 TB at 1 GB files
  * is a 10⁵-element list.
  *
  * Soundness: a file is pruned only when `min > hi` or `max < lo` for some
  * conjunct, evaluated on the stats of its NON-NULL values. Range
  * predicates never match NULL, so a file whose indexed column is all-null
  * (null min/max → null intersection test → not kept) is safely pruned and
  * the residual filter — always applied — keeps the row-level result exact
  * even when stats are stale or coarse. LawsPropertySpec-style soundness
  * is covered in SkippingSpec: pruned read == full-scan filter on random
  * boxes, multiset-equal. */
object Skipping {

  /** The manifest lives NEXT TO the data dir (`<dir>__stats`), not inside
    * it — an underscore file inside would be invisible to path reads (of
    * both sides), a plain file inside would join the table. */
  def statsPath(dir: String): String = dir.stripSuffix("/") + "__stats"

  /** Build (overwrite) the per-file stats manifest for `statCols`: one scan
    * of the table grouped by file. Run once per (re)write of `dir` — the
    * ingest-time half of the contract, like [[ZOrder.writeZOrdered]] is.
    * Manifest schema: file, n_rows, and per column c: min_c / max_c /
    * n_nulls_c (nulls tracked so an IS NULL reader could be added without
    * a schema change). */
  def writeStats(spark: SparkSession, dir: String, statCols: Seq[String]): Unit = {
    require(statCols.nonEmpty, "statCols must be non-empty")
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_nulls_$c"))
    }
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(statsPath(dir))
  }

  /** Incremental manifest maintenance: stat ONLY the data files not yet in
    * the manifest (an append's new files), keep existing rows for files that
    * still exist, and drop rows for files that vanished. An append of one
    * micro-batch to a 100 TB table costs one scan of THAT BATCH, not of the
    * table — the reason manifests beat stats-on-read at ingest cadence.
    * Existing rows ride through the driver: one small row per file, the same
    * bound [[selectFiles]] already accepts. Falls back to [[writeStats]]
    * when no manifest exists yet. */
  def updateStats(spark: SparkSession, dir: String, statCols: Seq[String]): Unit = {
    val manifest = statsPath(dir)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(manifest))) {
      writeStats(spark, dir, statCols); return
    }
    val old = spark.read.parquet(manifest)
    val oldRows = old.collect()
    // input_file_name() renders file: URIs; normalize for identity compares
    val onDisk = Compact.dataFiles(dir)
      .map(p => p.toUri.toString.stripSuffix("/")).toSet
    val known = oldRows.map(_.getAs[String]("file")).toSet
    val fresh = (onDisk -- known).toSeq.sorted
    val kept = oldRows.filter(r => onDisk(r.getAs[String]("file")))
    val keptDf = spark.createDataFrame(
      spark.sparkContext.parallelize(kept.toIndexedSeq, 1), old.schema)
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_nulls_$c"))
    }
    val freshDf =
      if (fresh.isEmpty) keptDf.limit(0)
      else spark.read.parquet(fresh: _*)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n_rows"), aggs: _*)
    // safe to overwrite in place: kept rows were collected above and fresh
    // stats read DATA files, so nothing in this lineage reads the manifest
    keptDf.unionByName(
        freshDf.select(old.schema.fieldNames.map(col).toIndexedSeq: _*))
      .coalesce(1).write.mode("overwrite").parquet(manifest)
  }

  /** The files of `dir` whose stats box intersects every `(column, lo, hi)`
    * conjunct (inclusive bounds), plus the total file count — the pruning
    * decision, separated out so callers and tests can observe kept/total. */
  def selectFiles(spark: SparkSession, dir: String,
      preds: Seq[(String, Long, Long)]): (Seq[String], Long) = {
    require(preds.nonEmpty, "give at least one (column, lo, hi) predicate")
    val stats = spark.read.parquet(statsPath(dir))
    val keep = preds.map { case (c, lo, hi) =>
      col(s"min_$c") <= hi && col(s"max_$c") >= lo
    }.reduce(_ && _)
    val total = stats.count()
    val files = stats.filter(keep).select(col("file"))
      .collect().map(_.getString(0)).toSeq
    (files, total)
  }

  /** Range-predicate read that opens only intersecting files. The residual
    * filter is applied on top, so the result equals
    * `spark.read.parquet(dir).filter(conjunction)` row-for-row on ANY
    * layout — the layout only decides how many files pay. */
  def prunedRead(spark: SparkSession, dir: String,
      preds: Seq[(String, Long, Long)]): DataFrame = {
    val (files, _) = selectFiles(spark, dir, preds)
    val residual = preds.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    if (files.isEmpty) {
      // exact schema, zero files opened at execution
      val schema = spark.read.parquet(dir).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.parquet(files: _*).filter(residual)
  }
}
