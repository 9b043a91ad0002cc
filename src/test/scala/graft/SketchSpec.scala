package graft

import graft.dedup.BloomDedup
import org.apache.spark.sql.functions._

/** Bloom prefilter contract + sketch-aggregate error bounds. */
class SketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  import spark.implicits._

  test("BloomDedup.newDocs equals the plain anti-join (exactness despite the prefilter)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val incoming = docs.filter(col("doc_id") % 3 === 0)
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val fast = BloomDedup.newDocs(incoming, corpus, "text").select("doc_id")
    val plain = incoming
      .join(corpus.select(col("text").as("__t")), col("text") === col("__t"), "left_anti")
      .select("doc_id")
    assert(fast.count() > 0)
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty)
  }

  test("BloomDedup edge cases: empty corpus returns ALL incoming; null text survives") {
    val incoming = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    // empty corpus: the sketch aggregate yields null — nothing may be dropped
    assert(BloomDedup.newDocs(incoming, incoming.filter(lit(false)), "text")
      .count() === 2L)
    // null-text rows never equal anything: the anti-join keeps them, so the
    // bloom path must too (they hash to null → must not vanish from both
    // filter branches)
    val corpus = Seq((9L, "a")).toDF("doc_id", "text")
    val got = BloomDedup.newDocs(incoming, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  test("bloom sketch: zero false negatives, bounded false-positive rate") {
    val members = (0L until 5000L).map(i => i * 2654435761L).toDF("fp")
    val bloom = BloomDedup.bloomBytes(members, col("fp"),
      expectedItems = 5000L, numBits = 65536L)
    assert(members.filter(!BloomDedup.mightContain(bloom, col("fp"))).count() === 0L,
      "Bloom filters must never reject a member")
    val absent = (0L until 5000L).map(i => i * 2654435761L + 1L).toDF("fp")
    val fps = absent.filter(BloomDedup.mightContain(bloom, col("fp"))).count()
    assert(fps < 500L, s"false-positive rate out of band: $fps/5000")
  }

  test("approx_count_distinct within HLL error of exact; quantile sketch brackets exact median") {
    val e = spark.read.parquet(s"$sfDir/events.parquet")
    val approx = e.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, x) =>
      assert(math.abs(approx(k) - x) <= math.max(1L, (x * 0.1).toLong), s"$k: ${approx(k)} vs $x")
    }
    val p50 = e.agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("p"))
      .head.getDouble(0)
    val med = e.agg(expr("percentile(value, 0.5)").as("m")).head.getDouble(0)
    // 10000-bucket sketch on 1000 rows is exact up to interpolation
    assert(math.abs(p50 - med) <= math.abs(med) * 0.05 + 1e-6, s"$p50 vs $med")
  }
}
