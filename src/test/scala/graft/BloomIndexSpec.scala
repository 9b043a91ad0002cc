package graft

import java.nio.file.Files

import graft.functions.BloomAgg
import graft.layout.BloomIndex
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Per-file bloom index: aggregate correctness (no false negatives through
  * update/merge/serialize round-trips), lookup SOUNDNESS (pruned lookup ==
  * full-scan filter on random present/absent keys — the law that makes the
  * index safe at any fpp), and EFFECTIVENESS (a point lookup on a layout
  * where each key lives in one file opens few files; min/max skipping on the
  * same unclustered column keeps all of them — the measured reason BloomIndex
  * exists beside Skipping). */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  /** ids 0..n-1 hash-scattered over `files` files: every file's id MIN/MAX
    * spans ~the whole domain (min/max prunes nothing), each id in ONE file. */
  private def writeScattered(n: Int, files: Int): String = {
    val dir = Files.createTempDirectory("graft-bloom").toString + "/t"
    (0 until n).map(i => (i.toLong, s"u${i % 97}")).toDF("id", "tag")
      .repartition(files, col("id"))
      .write.parquet(dir)
    BloomIndex.writeIndex(spark, dir, "id", expectedItemsPerFile = 4096, fpp = 0.01)
    dir
  }

  test("bloom_agg: no false negatives across update, merge and serialization") {
    // many input partitions per group forces partial buffers + merge path
    val df = (0 until 2000).map(i => (i % 4, i.toLong)).toDF("g", "v")
      .repartition(16)
    val blooms = df.groupBy(col("g"))
      .agg(BloomAgg.bloomAgg(col("v"), 1000, 0.03).as("bloom"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("bloom")).toMap
    for (g <- 0 until 4; v <- g until 2000 by 4)
      assert(BloomAgg.mightContain(blooms(g), v.toLong),
        s"false negative: group $g must contain $v")
    // fpp sanity on absent keys: well under 50% at fpp=0.03
    val fp = (2000 until 4000).count(v => BloomAgg.mightContain(blooms(0), v.toLong))
    assert(fp < 400, s"absent-key hit rate implausibly high: $fp/2000")
  }

  test("bloom_agg hashes string columns consistently with the driver probe") {
    val blooms = Seq("alpha", "beta", "café").toDF("s")
      .agg(BloomAgg.bloomAgg(col("s"), 100, 0.01).as("bloom"))
      .collect().head.getAs[Array[Byte]]("bloom")
    for (s <- Seq("alpha", "beta", "café"))
      assert(BloomAgg.mightContain(blooms, s), s"false negative on '$s'")
    assert(!Seq("gamma", "delta", "epsilon", "zeta", "eta")
      .forall(s => BloomAgg.mightContain(blooms, s)),
      "every absent string hit — probe/build hashing disagree or filter is saturated")
  }

  test("nulls are skipped, not counted against the filter") {
    val blooms = Seq(Some(1L), None, Some(2L), None).toDF("v")
      .agg(BloomAgg.bloomAgg(col("v"), 100, 0.01).as("bloom"))
      .collect().head.getAs[Array[Byte]]("bloom")
    assert(BloomAgg.mightContain(blooms, 1L) && BloomAgg.mightContain(blooms, 2L))
  }

  test("soundness law: lookup == full-scan IN filter on random present/absent keys") {
    val dir = writeScattered(8192, 16)
    val full = spark.read.parquet(dir)
    val keyGen = Gen.listOfN(5, Gen.choose(-100L, 9000L)) // spans absent keys
    val probes = Gen.listOfN(10, keyGen)(Gen.Parameters.default, Seed(11L)).get
    for (keys <- probes) {
      val got = BloomIndex.lookup(spark, dir, "id", keys)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val want = full.filter(col("id").isin(keys: _*))
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === want, s"keys $keys")
    }
  }

  test("parity law: distributed probe keeps exactly the driver probe's file set") {
    // selectFilesDistributed must be a drop-in for selectFiles: same blooms,
    // same hashing, same short-circuit — only WHERE the probe runs differs
    // (executors filter the manifest; the driver never holds a bloom)
    val dir = writeScattered(8192, 16)
    val probes = Seq(
      Seq[Any](12L, 4077L, 8000L),          // present longs
      Seq[Any](-5L, 999999L),               // all absent
      (0L until 40L).toSeq: Seq[Any])       // wide mixed set
    for (keys <- probes) {
      val (driverKept, driverTotal) = BloomIndex.selectFiles(spark, dir, "id", keys)
      val (distKept, distTotal) = BloomIndex.selectFilesDistributed(spark, dir, "id", keys)
      assert(distKept.sorted === driverKept.sorted, s"keys $keys")
      assert(distTotal === driverTotal)
    }
    // and over string keys (UTF-8 hashing contract shared by both probes)
    val sdir = Files.createTempDirectory("graft-bloom-s").toString + "/t"
    (0 until 512).map(i => (s"k$i", i)).toDF("name", "v")
      .repartition(4, col("name")).write.parquet(sdir)
    BloomIndex.writeIndex(spark, sdir, "name", expectedItemsPerFile = 1024)
    val sKeys = Seq[Any]("k1", "k200", "café", "absent")
    assert(BloomIndex.selectFilesDistributed(spark, sdir, "name", sKeys)._1.sorted ===
      BloomIndex.selectFiles(spark, sdir, "name", sKeys)._1.sorted)
  }

  test("sharded index write (no coalesce) keeps one manifest row per data file") {
    val dir = writeScattered(2048, 8)
    val manifest = spark.read.parquet(BloomIndex.indexPath(dir, "id"))
    assert(manifest.count() === 8L)
    assert(manifest.select("file").distinct().count() === 8L)
  }

  test("effectiveness: point lookup opens few files where min/max keeps all") {
    val dir = writeScattered(8192, 16)
    val keys = Seq(12L, 4077L, 8000L)
    val (kept, total) = BloomIndex.selectFiles(spark, dir, "id", keys)
    assert(total === 16L, s"fixture should write 16 files, saw $total")
    assert(kept.size <= 6, s"bloom should keep ~3 of 16 files, kept ${kept.size}")
    // the same predicate through min/max stats: every file's box spans the
    // domain, nothing prunes — the gap this index closes
    graft.layout.Skipping.writeStats(spark, dir, Seq("id"))
    val (mmKept, mmTotal) =
      graft.layout.Skipping.selectFiles(spark, dir, Seq(("id", 4077L, 4077L)))
    assert(mmKept.size.toLong === mmTotal,
      s"min/max on the scattered layout should keep every file: ${mmKept.size}/$mmTotal")
  }

  test("all-absent key set reads zero files and yields an empty, schema-exact frame") {
    val dir = writeScattered(1024, 8)
    val out = BloomIndex.lookup(spark, dir, "id", Seq(-5L, 999999L))
    assert(out.isEmpty && out.columns.toSeq === Seq("id", "tag"))
  }
}
