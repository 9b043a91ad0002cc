package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimension data-skipping layout.
  *
  * Sorting by a single column makes that column's per-file min/max ranges
  * tight and every OTHER column's span the whole domain, so predicates on
  * the second dimension prune nothing. Interleaving the bits of both
  * dimensions into one sort key keeps EVERY dimension's per-file bounding
  * box small (each file covers a square-ish region of the value space), so
  * parquet row-group / file statistics prune scans for predicates on either
  * column — the lakehouse OPTIMIZE ZORDER BY story. At 100 TB this is the
  * difference between "point query on user touches every file" and "touches
  * O(√files)".
  *
  * The interleave is the classic bit-spread by magic masks, composed from
  * `shiftleft`/`bitwiseAND` built-ins — whole-stage-codegen'd, and the same
  * five-step arithmetic is plain SQL in any engine (the DuckDB oracle for
  * `q_zorder` runs it with `<<`/`&`), so the key is engine-exact. */
object ZOrder {

  /** Bits of `x` (low 16 taken) spread to even positions of a 32-bit word. */
  private def spread16(x: Column): Column = {
    val masks = Seq(
      (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
    masks.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (acc, (shift, mask)) =>
      (acc.bitwiseOR(shiftleft(acc, shift))).bitwiseAND(lit(mask))
    }
  }

  /** Morton code of two 16-bit dimensions: `a`'s bits at odd positions,
    * `b`'s at even — bigint in [0, 2^32). Values outside [0, 65535] are
    * masked to their low 16 bits; normalize/bucket wider domains first
    * (rank, percentile bucket, or `value % 65536`). */
  def zorder2(a: Column, b: Column): Column =
    shiftleft(spread16(a), 1).bitwiseOR(spread16(b)).as("zorder2")

  /** Rewrite `df` into `nFiles` files clustered by the z-value of the two
    * dimension columns: range-partition + sort by z, one file per range —
    * each output file covers a compact rectangle of (dimA, dimB) space.
    * `ZOrderSpec` measures the effect: per-file spans of BOTH dimensions
    * shrink to ~domain/√nFiles, where a plain sort leaves dimB at full
    * domain width in every file. */
  def writeZOrdered(df: DataFrame, dimA: Column, dimB: Column,
      path: String, nFiles: Int = 16): Unit =
    df.withColumn("__z", zorder2(dimA, dimB))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** MONOTONE rank normalization of a skewed or wide `column` onto
    * [0, buckets): the [[zorder2]] dimension prep for real domains.
    *
    * `zorder2` takes a value's LOW 16 BITS, so a column wider than 2^16 fed
    * raw (or through `% 65536`) scrambles value order — files stop covering
    * contiguous value ranges and RANGE predicates prune nothing, which
    * silently defeats the whole layout on exactly the columns (ids, bytes,
    * prices, long timestamps) that need it at 100 TB. Rank bucketing maps a
    * value to how many approximate-quantile boundaries lie at-or-below it —
    * order-PRESERVING, so per-file raw min/max stats stay tight and
    * [[Skipping]]'s range pruning keeps working on the original column —
    * and rank-uniform, so buckets (hence files) get even row counts no
    * matter how skewed the values.
    *
    * Mechanics: `buckets-1` quantile boundaries (one driver-side
    * `approxQuantile` pass; at production scale compute them on a sample —
    * precision only affects balance, never correctness, precisely because
    * the map is monotone) fed to the codegen [[graft.functions.AsofIndex]]
    * binary search: O(log buckets) per row, whole-stage-codegen'd. Repeated
    * heavy-hitter values collapse duplicate boundaries and simply share a
    * bucket. */
  def rankBuckets(df: DataFrame, column: String, buckets: Int = 4096,
      relativeError: Double = -1.0): Column =
    fromBounds(column, quantileBounds(df, Array(column), buckets, relativeError).head)

  /** One `approxQuantile` pass over ALL requested columns (Spark's
    * multi-column overload) — [[writeZOrderedByRank]] must not pay one
    * full-table scan per dimension. `relativeError <= 0` means auto:
    * 0.1/buckets, a tenth of a bucket's rank share — the library default
    * 1e-4 is COARSER than a 1/65536 bucket and would collapse adjacent
    * boundaries, quietly forfeiting the promised file balance. */
  private def quantileBounds(df: DataFrame, columns: Array[String],
      buckets: Int, relativeError: Double): Array[Array[Long]] = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets out of range for a 16-bit z dimension: $buckets")
    val err = if (relativeError > 0) relativeError else 0.1 / buckets
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = df.stat.approxQuantile(columns, probs, err)
      .map(_.map(d => math.floor(d).toLong))
    columns.zip(bounds).foreach { case (c, b) =>
      require(b.nonEmpty,
        s"rankBuckets($c): no non-null values to draw quantile boundaries " +
          "from — an all-bucket-0 layout would funnel the whole write " +
          "through one range partition")
    }
    bounds
  }

  private def fromBounds(column: String, bounds: Array[Long]): Column =
    coalesce(
      graft.functions.AsofFunctions.asof_index(lit(bounds), col(column).cast("long")),
      lit(0)).cast("long").as(s"rank_$column")

  /** [[writeZOrdered]] with both dimensions rank-normalized first — the
    * variant to reach for when either column's domain exceeds 16 bits or is
    * skewed. Both boundary sets come from ONE quantile pass. Bucket-count
    * note: the boundary arrays ride the z expression into every task
    * (8 bytes × buckets × 2 dims), and resolution beyond
    * (files × row-groups-per-file) buys nothing — the 4096 default covers
    * ~16 M cells; raise toward 65536 only for very large file counts. */
  def writeZOrderedByRank(df: DataFrame, dimA: String, dimB: String,
      path: String, nFiles: Int = 16, buckets: Int = 4096,
      relativeError: Double = -1.0): Unit = {
    val bounds = quantileBounds(df, Array(dimA, dimB), buckets, relativeError)
    writeZOrdered(df, fromBounds(dimA, bounds(0)), fromBounds(dimB, bounds(1)),
      path, nFiles)
  }
}
