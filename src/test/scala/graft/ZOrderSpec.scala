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
