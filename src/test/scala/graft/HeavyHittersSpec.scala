package graft

import graft.agg.HeavyHitters
import graft.functions.MisraGries.misraGries
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Misra–Gries summary laws (guaranteed membership above n/k, lower-bound
  * counts within n/k, ≤ k−1 counters — across partitionings, exercising the
  * merge rule) and the exact two-pass heavy hitters against brute force. */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  /** Zipf-ish stream: item i drawn with weight ~ 1/(i+1). */
  private def stream(n: Int, seed: Long): Seq[String] = {
    val g = Gen.frequency((1 to 12).map(i => (120 / i, Gen.const(s"w$i"))): _*)
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed)).get
  }

  test("law: every item above n/k is summarized; counts are lower bounds within n/k") {
    for (seed <- 1L to 3L; parts <- Seq(1, 16)) {
      val xs = stream(3000, seed)
      val k = 8
      val exact = xs.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val got = xs.toDF("w").repartition(parts)
        .agg(misraGries(col("w"), k).as("m"))
        .collect().head.getAs[Map[String, Long]]("m")
      assert(got.size <= k - 1, s"summary overflow: ${got.size}")
      val n = xs.size.toLong
      for ((w, c) <- exact if c * k > n)
        assert(got.contains(w), s"seed=$seed parts=$parts lost $w (count $c > n/k)")
      for ((w, est) <- got) {
        val truth = exact(w)
        assert(est <= truth && est >= truth - n / k,
          s"seed=$seed parts=$parts $w: est $est vs truth $truth (n/k=${n / k})")
      }
    }
  }

  test("exactTop equals brute force, bit-for-bit, across partitionings") {
    for (parts <- Seq(2, 32)) {
      val df = stream(5000, 42L).toDF("w").repartition(parts)
      val got = HeavyHitters.exactTop(df, "w", k = 6)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = df.count()
      val want = df.groupBy("w").count().filter(col("count") * 6 > n)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"parts=$parts")
      assert(got.nonEmpty, "the zipf head must qualify at k=6")
    }
  }

  test("uniform data with no qualifier yields an empty, schema-exact frame") {
    val df = (0 until 1000).map(i => s"u${i % 100}").toDF("w")
    val out = HeavyHitters.exactTop(df, "w", k = 50) // threshold 2%, all at 1%
    assert(out.isEmpty && out.columns.toSeq === Seq("item", "n_occurrences"))
  }

  test("NULLs are not items and do not count toward n") {
    val df = (Seq.fill(60)(Some("hot")) ++ Seq.fill(40)(Option.empty[String]))
      .toDF("w")
    val got = HeavyHitters.exactTop(df, "w", k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n counts non-null (60); hot = 60 > 60/2 qualifies
    assert(got === Map("hot" -> 60L))
  }
}
