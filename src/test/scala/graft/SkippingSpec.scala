package graft

import java.nio.file.Files

import graft.layout.{Skipping, ZOrder}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Stats-manifest correctness, pruning SOUNDNESS (random boxes: pruned read
  * == full-scan filter, multiset-equal — the law that makes skipping safe),
  * and pruning EFFECTIVENESS (a 2-D box on the z-ordered layout opens few
  * files; the same box on a layout sorted by one dimension opens ~all of
  * them for the other dimension's share — the measured reason ZOrder and
  * Skipping ship together). */
class SkippingSpec extends SparkSpec {

  import spark.implicits._

  private def grid(n: Int) = (0 until n).map { i =>
    (i.toLong, i.toLong * 37 % 256, i.toLong * 101 % 256) }
    .toDF("id", "a", "b")

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft-skip").toString + "/t"
    ZOrder.writeZOrdered(grid(8192), col("a"), col("b"), dir, nFiles = 16)
    Skipping.writeStats(spark, dir, Seq("a", "b"))
    dir
  }

  test("writeStats: one manifest row per file, exact per-file min/max and null counts") {
    val dir = Files.createTempDirectory("graft-skip").toString + "/t"
    Seq((1L, Some(5L)), (2L, Some(9L)), (3L, None))
      .toDF("id", "a").coalesce(1).write.parquet(dir)
    Skipping.writeStats(spark, dir, Seq("a"))
    val stats = spark.read.parquet(Skipping.statsPath(dir)).collect()
    assert(stats.length === 1)
    val r = stats.head
    assert(r.getAs[Long]("n_rows") === 3L && r.getAs[Long]("min_a") === 5L &&
      r.getAs[Long]("max_a") === 9L && r.getAs[Long]("n_nulls_a") === 1L)
  }

  test("soundness law: pruned read == full-scan filter on random boxes (multiset)") {
    val dir = writeFixture()
    val full = spark.read.parquet(dir)
    val boxGen = for {
      lo1 <- Gen.choose(-10L, 260L); w1 <- Gen.choose(0L, 120L)
      lo2 <- Gen.choose(-10L, 260L); w2 <- Gen.choose(0L, 120L)
    } yield ((lo1, lo1 + w1), (lo2, lo2 + w2))
    val boxes = Gen.listOfN(12, boxGen)(Gen.Parameters.default, Seed(7L)).get
    for ((((alo, ahi), (blo, bhi))) <- boxes) {
      val preds = Seq(("a", alo, ahi), ("b", blo, bhi))
      val got = Skipping.prunedRead(spark, dir, preds)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val want = full.filter(col("a").between(alo, ahi) && col("b").between(blo, bhi))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === want, s"box a[$alo,$ahi] b[$blo,$bhi]")
    }
  }

  test("effectiveness: a 2-D box prunes most z-ordered files; 1-D sort can't prune dim B") {
    val dir = writeFixture()
    val preds = Seq(("a", 32L, 63L), ("b", 96L, 127L)) // a 32×32 box of 256²
    val (zKept, zTotal) = Skipping.selectFiles(spark, dir, preds)
    assert(zTotal >= 12L, s"fixture should write ~16 files, saw $zTotal")
    assert(zKept.size.toLong * 2 <= zTotal,
      s"z-ordered box query should prune at least half: kept ${zKept.size}/$zTotal")

    val sDir = Files.createTempDirectory("graft-skip").toString + "/s"
    grid(8192).repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.parquet(sDir)
    Skipping.writeStats(spark, sDir, Seq("a", "b"))
    // predicate on the UNSORTED dimension alone: every file spans ~all of b
    val (bKept, bTotal) = Skipping.selectFiles(spark, sDir, Seq(("b", 96L, 127L)))
    assert(bKept.size.toLong * 10 >= bTotal * 9,
      s"1-D sorted layout should keep ~all files under a dim-B box: ${bKept.size}/$bTotal")
    // ...while the z-ordered layout prunes on b alone too
    val (zbKept, _) = Skipping.selectFiles(spark, dir, Seq(("b", 96L, 127L)))
    assert(zbKept.size < bKept.size,
      s"z layout must beat the 1-D sort on dim B: ${zbKept.size} vs ${bKept.size}")
  }

  test("an all-null indexed column file is pruned, and empty keep-sets read nothing") {
    val dir = Files.createTempDirectory("graft-skip").toString + "/t"
    Seq((1L, Option(5L)), (2L, Option(6L))).toDF("id", "a")
      .coalesce(1).write.parquet(dir)
    Seq((3L, Option.empty[Long]), (4L, Option.empty[Long])).toDF("id", "a")
      .coalesce(1).write.mode("append").parquet(dir)
    Skipping.writeStats(spark, dir, Seq("a"))
    val (kept, total) = Skipping.selectFiles(spark, dir, Seq(("a", 0L, 100L)))
    assert(total === 2L && kept.size === 1,
      s"the all-null file must be pruned under a range predicate: $kept")
    val out = Skipping.prunedRead(spark, dir, Seq(("a", 0L, 100L)))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(1L, 2L))
    // a box hitting nothing: zero files, empty frame with the right schema
    val none = Skipping.prunedRead(spark, dir, Seq(("a", 500L, 600L)))
    assert(none.isEmpty && none.columns.toSeq === Seq("id", "a"))
  }
}
