package graft

import java.nio.file.Files

import graft.layout.ZOrder
import org.apache.spark.sql.functions._

/** Morton-key correctness + the layout effect the key exists for: per-file
  * bounding boxes shrink in BOTH dimensions under a z-order write, where a
  * single-column sort leaves the second dimension at full domain width. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zorder2 bit-interleave: known values, bounds, masking") {
    val df = Seq(
      (0L, 0L), (1L, 1L), (2L, 1L), (0xFFFFL, 0L), (0L, 0xFFFFL),
      (0xFFFFL, 0xFFFFL), (0x10000L, 0L) // 17th bit masked away
    ).toDF("a", "b")
    val got = df.select(col("a"), col("b"), ZOrder.zorder2(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 0L)) === 0L)
    assert(got((1L, 1L)) === 3L)        // ...a0 b0 = 11
    assert(got((2L, 1L)) === 9L)        // a=10 at odd bits (1000), b=1 → 1001
    assert(got((0xFFFFL, 0L)) === 0xAAAAAAAAL)
    assert(got((0L, 0xFFFFL)) === 0x55555555L)
    assert(got((0xFFFFL, 0xFFFFL)) === 0xFFFFFFFFL)
    assert(got((0x10000L, 0L)) === 0L, "bits above 16 must be masked")
  }

  test("z-order locality: interleaved keys adjacent in z are close in BOTH dims") {
    // successive z-codes differ by small steps in (a, b) most of the time —
    // check the inverse: a large sample of pairs close in z are close in
    // space on average (the property file-range pruning relies on)
    val n = 4096
    val pts = (0 until n).map { i => (i.toLong * 37 % 256, i.toLong * 101 % 256) }
      .toDF("a", "b")
    val byZ = pts.select(col("a"), col("b"), ZOrder.zorder2(col("a"), col("b")))
      .orderBy(col("zorder2")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val steps = byZ.sliding(2).map { case Array((a1, b1), (a2, b2)) =>
      math.abs(a1 - a2) + math.abs(b1 - b2) }.toSeq
    // average Manhattan step along the curve stays near-constant; a sort by
    // `a` alone makes the b-coordinate jump ~domain/3 per step on average
    assert(steps.sum.toDouble / steps.size < 32.0,
      s"avg z-neighbour distance ${steps.sum.toDouble / steps.size}")
  }

  test("rankBuckets: monotone, rank-uniform, heavy hitters share a bucket") {
    val vals = ((0 until 2000).map(i => (i.toLong * i * i) % 1000000007L) ++
      Seq.fill(500)(42L)).zipWithIndex // wide skewed domain + one heavy hitter
    val df = vals.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bucketed = df.select(col("v"),
      graft.layout.ZOrder.rankBuckets(df, "v", buckets = 64).as("rb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // monotone: sorting by value sorts by bucket
    val byVal = bucketed.sortBy(_._1).map(_._2)
    assert(byVal.zip(byVal.tail).forall { case (x, y) => x <= y })
    assert(bucketed.map(_._2).min >= 0L && bucketed.map(_._2).max < 64L)
    // every copy of the heavy hitter lands in ONE bucket
    assert(bucketed.filter(_._1 == 42L).map(_._2).distinct.length === 1)
    // rank-uniform despite value skew: the largest bucket holds at most a
    // few times the ideal share (the hitter's 20 % is the allowed outlier)
    val sizes = bucketed.groupBy(_._2).map(_._2.length)
    assert(sizes.max <= vals.size / 64 * 16, s"max bucket ${sizes.max}")
  }

  test("writeZOrderedByRank keeps RANGE pruning alive on a wide skewed domain " +
      "where raw low-16-bit z-ordering scrambles it") {
    import graft.layout.Skipping
    val n = 8192
    // both dims skewed over ~2^40 — far beyond zorder2's 16 bits
    val df = (0 until n).map { i =>
      val a = (i.toLong % 128) * (i % 128) * (i % 128) * (i % 128) * 17L
      val b = ((i.toLong * 31) % 128) * ((i * 31) % 128) * ((i * 31) % 128) * 23L
      (i.toLong, a, b)
    }.toDF("id", "a", "b")
    def keptRatio(dir: String): Double = {
      Skipping.writeStats(spark, dir, Seq("a", "b"))
      // a rank-25% box in BOTH dims, expressed on the RAW values
      val qa = df.stat.approxQuantile("a", Array(0.25), 0.001).head.toLong
      val qb = df.stat.approxQuantile("b", Array(0.25), 0.001).head.toLong
      val (kept, total) = Skipping.selectFiles(spark, dir,
        Seq(("a", 0L, qa), ("b", 0L, qb)))
      kept.size.toDouble / total
    }
    val rawDir = Files.createTempDirectory("graft-zr").toString + "/raw"
    ZOrder.writeZOrdered(df, col("a"), col("b"), rawDir, nFiles = 16)
    val rankDir = Files.createTempDirectory("graft-zr").toString + "/rank"
    ZOrder.writeZOrderedByRank(df, "a", "b", rankDir, nFiles = 16, buckets = 256)

    val rawKept = keptRatio(rawDir)
    val rankKept = keptRatio(rankDir)
    // raw: low-16-bit masking scrambles value order → ~every file's raw
    // min/max box intersects the query box; rank: files cover contiguous
    // rank rectangles → most are pruned
    assert(rawKept > 0.8, s"raw z on a wide domain should prune ~nothing: $rawKept")
    assert(rankKept <= 0.5, s"rank z must restore pruning: $rankKept")
    // and the rewrite is content-preserving
    assert(spark.read.parquet(rankDir).count() === n.toLong)
  }

  test("writeZOrdered: per-file bounding boxes small in BOTH dims; plain sort fails dim B") {
    val n = 16384
    val df = (0 until n).map { i =>
      (i.toLong, i.toLong * 37 % 65536, i.toLong * 101 % 65536) }
      .toDF("id", "a", "b").repartition(4)
    def spans(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col("a")) - min(col("a"))).as("sa"),
          (max(col("b")) - min(col("b"))).as("sb"))
        .collect()
      (perFile.map(_.getLong(1)).sum.toDouble / perFile.length,
        perFile.map(_.getLong(2)).sum.toDouble / perFile.length)
    }
    val zDir = Files.createTempDirectory("graft-z").toString + "/z"
    ZOrder.writeZOrdered(df, col("a"), col("b"), zDir, nFiles = 16)
    val (za, zb) = spans(zDir)

    val sDir = Files.createTempDirectory("graft-z").toString + "/s"
    df.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(sDir)
    val (sa, sb) = spans(sDir)

    // plain sort: dim A tight, dim B full-width; z-order: BOTH bounded
    assert(sa < 0.2 * 65536, s"sorted-by-a a-span $sa")
    assert(sb > 0.8 * 65536, s"sorted-by-a b-span $sb should be ~full domain")
    assert(za < 0.5 * 65536, s"zorder a-span $za")
    assert(zb < 0.5 * 65536, s"zorder b-span $zb")
    assert(zb < 0.6 * sb, s"zorder must beat the sort on dim B: $zb vs $sb")
  }
}
