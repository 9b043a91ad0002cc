package graft

import graft.temporal.Anomaly
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Rolling median/MAD anomaly flags: hand-computed exact math, spike
  * detection WITH baseline robustness (the point of median over mean: the
  * spike in the trailing window must not blind the detector), warm-up and
  * flatline edges, and a randomized law against a sequential Scala
  * reference model. */
class AnomalySpec extends SparkSpec {

  import spark.implicits._

  private def run(vals: Seq[Long], window: Int, k: Int): Seq[Row] =
    Anomaly.madFlags(
      vals.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
        .toDF("key", "t", "v"),
      Seq("key"), Seq("t"), "v", window, k)
      .orderBy("t").collect().toSeq

  test("exact integer med2/dev2/mad4 on a hand-computed window") {
    val rows = run(Seq(10L, 12L, 11L, 13L, 50L, 12L), window = 4, k = 3)
    val spike = rows(4) // x=50 over sorted win [10,11,12,13]
    assert(spike.getAs[Long]("med2") === 23L)
    assert(spike.getAs[Long]("dev2") === 77L)
    assert(spike.getAs[Long]("mad4") === 4L)
    assert(spike.getAs[Int]("anomaly") === 1)
    // the NEXT normal point: the spike sits in its window [11,12,13,50],
    // yet median/MAD barely move — not flagged (a mean/stddev baseline
    // inflated by the spike is the failure mode this operator avoids)
    val after = rows(5)
    assert(after.getAs[Long]("med2") === 25L)
    assert(after.getAs[Long]("dev2") === 1L)
    assert(after.getAs[Long]("mad4") === 4L)
    assert(after.getAs[Int]("anomaly") === 0)
  }

  test("warm-up rows carry data but NULL baselines and flags") {
    val rows = run(Seq(1L, 2L, 3L, 4L, 5L), window = 4, k = 3)
    for (i <- 0 until 4) {
      assert(rows(i).isNullAt(rows(i).fieldIndex("med2")), s"row $i med2")
      assert(rows(i).isNullAt(rows(i).fieldIndex("anomaly")), s"row $i anomaly")
    }
    assert(!rows(4).isNullAt(rows(4).fieldIndex("anomaly")))
  }

  test("flatline baseline: MAD=0 flags any move, not the constant continuation") {
    val rows = run(Seq(7L, 7L, 7L, 7L, 7L, 9L), window = 4, k = 6)
    assert(rows(4).getAs[Long]("mad4") === 0L)
    assert(rows(4).getAs[Int]("anomaly") === 0, "constant continuation must not flag")
    assert(rows(5).getAs[Int]("anomaly") === 1, "any move off a flatline must flag")
  }

  test("NULL current value yields NULL flag; a NULL inside the frame is insufficient history") {
    val df = Seq(("a", 0L, Some(5L)), ("a", 1L, Some(6L)), ("a", 2L, None),
      ("a", 3L, Some(5L)), ("a", 4L, Some(6L)), ("a", 5L, Some(7L)),
      ("a", 6L, Some(6L)), ("a", 7L, Some(6L)))
      .toDF("key", "t", "v")
    val rows = Anomaly.madFlags(df, Seq("key"), Seq("t"), "v", window = 4, k = 3)
      .orderBy("t").collect()
    assert(rows(2).isNullAt(rows(2).fieldIndex("dev2")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("anomaly")))
    // frames containing the NULL (t=3..6) shrink below `window` → judged
    // insufficient, NULL baseline — conservative, never a made-up flag
    for (i <- 3 to 6)
      assert(rows(i).isNullAt(rows(i).fieldIndex("med2")), s"row $i med2")
    // t=7 is the first null-free full frame: t=3..6 → sorted [5,6,6,7]
    assert(rows(7).getAs[Long]("med2") === 12L)
    assert(rows(7).getAs[Int]("anomaly") === 0)
  }

  test("law: flags match a sequential reference model on random series (two keys)") {
    val window = 5; val k = 3
    def ref(vals: Seq[Long]): Seq[Option[Int]] = vals.indices.map { i =>
      if (i < window) None
      else {
        val win = vals.slice(i - window, i).sorted
        val med2 = win((window - 1) / 2) + win(window / 2)
        val devs = win.map(x => math.abs(2 * x - med2)).sorted
        val mad4 = devs((window - 1) / 2) + devs(window / 2)
        Some(if (2 * math.abs(2 * vals(i) - med2) > k * mad4) 1 else 0)
      }
    }
    val gen = Gen.listOfN(64, Gen.frequency(
      9 -> Gen.choose(90L, 110L), 1 -> Gen.choose(0L, 1000L)))
    for (seed <- 1L to 4L) {
      val a = gen(Gen.Parameters.default, Seed(seed)).get
      val b = gen(Gen.Parameters.default, Seed(seed + 100)).get
      val df = (a.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) } ++
        b.zipWithIndex.map { case (v, i) => ("b", i.toLong, v) })
        .toDF("key", "t", "v").repartition(8)
      val got = Anomaly.madFlags(df, Seq("key"), Seq("t"), "v", window, k)
        .select("key", "t", "anomaly").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
      val want = ref(a).zipWithIndex.map { case (f, i) => ("a", i.toLong) -> f } ++
        ref(b).zipWithIndex.map { case (f, i) => ("b", i.toLong) -> f }
      for ((kk, f) <- want) assert(got(kk) === f, s"seed $seed at $kk")
    }
  }
}
