package graft

import graft.temporal.Series
import org.apache.spark.sql.functions._

/** Grid construction (boundary ceil/floor, sub-slot keys, circuit breaker),
  * fill-forward parity with a brute-force per-point recompute, and
  * counter-increase semantics (growth, plateau, reset, first-sample null). */
class SeriesSpec extends SparkSpec {

  import spark.implicits._

  test("grid: ceil/floor slot bounds, sub-slot keys dropped, exact boundaries kept") {
    val obs = Seq(
      ("a", 100L), ("a", 305L),  // step 100: lo=ceil(100/100)=1, hi=floor(305/100)=3
      ("b", 150L), ("b", 190L),  // inside one slot: lo=2 > hi=1 → no rows
      ("c", 200L), ("c", 400L)   // exact boundaries: lo=2, hi=4
    ).toDF("k", "ts_us")
    val g = Series.grid(obs, Seq("k"), "ts_us", stepUs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(g === Seq(("a", 100L), ("a", 200L), ("a", 300L),
      ("c", 200L), ("c", 300L), ("c", 400L)))
  }

  test("grid: a sentinel timestamp trips the circuit breaker naming the key") {
    val obs = Seq(("ok", 100L), ("ok", 900L),
      ("evil", 0L), ("evil", 253402300799000000L)).toDF("k", "ts_us")
    val e = intercept[Exception] {
      Series.grid(obs, Seq("k"), "ts_us", stepUs = 100L).count()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msg.contains("Series.grid") && msg.contains("key=evil"), msg)
  }

  test("grid: a negative (pre-1970) timestamp fails fast instead of a silently wrong grid") {
    // div truncates toward zero, so ceil/floor slot math is only floor
    // division for non-negative operands — a negative min would drop valid
    // slots or emit points after the key's last observation
    val obs = Seq(("ok", 100L), ("bad", -5000000L), ("bad", 100L)).toDF("k", "ts_us")
    val e = intercept[Exception] {
      Series.grid(obs, Seq("k"), "ts_us", stepUs = 100L).count()
    }
    val msg = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msg.contains("negative timestamps") && msg.contains("key=bad"), msg)
  }

  test("fillForward equals the brute-force latest-at-or-before at every grid point") {
    val obs = Seq(
      ("a", 100L, 10L), ("a", 250L, 20L), ("a", 300L, 30L), ("a", 999L, 40L),
      ("b", 50L, 1L), ("b", 610L, 2L)
    ).toDF("k", "ts_us", "v")
    val got = Series.fillForward(obs, Seq("k"), "ts_us", stepUs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val raw = Seq(
      ("a", 100L, 10L), ("a", 250L, 20L), ("a", 300L, 30L), ("a", 999L, 40L),
      ("b", 50L, 1L), ("b", 610L, 2L))
    val want = (for {
      k <- Seq("a", "b")
      ks = raw.filter(_._1 == k)
      lo = (ks.map(_._2).min + 99) / 100
      hi = ks.map(_._2).max / 100
      slot <- lo to hi
      ts = slot * 100
    } yield (k, ts, ks.filter(_._2 <= ts).maxBy(_._2)._3)).sorted
    assert(got === want)
    // exact-boundary inclusivity: grid point 300 for a must carry v=30
    assert(got.contains(("a", 300L, 30L)))
  }

  test("grid: a column name needing backticks is handled (no expr-string interpolation)") {
    // regression pin for the ADVICE expr-injection class (commit ff6d2e6's
    // weightedSample fix): the caller-supplied ts column now enters only via
    // the Column API, so names with spaces/dashes/keywords parse fine
    val obs = Seq(("a", 100L), ("a", 305L)).toDF("k", "ts col-1")
    val g = Series.grid(obs, Seq("k"), "ts col-1", stepUs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(g === Seq(("a", 100L), ("a", 200L), ("a", 300L)))
  }

  test("fillForward: tieBreak makes duplicate-(key, ts) fills deterministic") {
    // two observations at the SAME (key, ts) with different payloads: with
    // tieBreak on the unique id, the GREATEST id's payload must fill — under
    // any partitioning
    val obs = Seq(
      ("a", 100L, 1L, "first"), ("a", 100L, 2L, "second"),
      ("a", 250L, 3L, "third")).toDF("k", "ts_us", "id", "v")
    for (parts <- Seq(1, 3, 7)) {
      val got = Series.fillForward(obs.repartition(parts), Seq("k"), "ts_us",
          stepUs = 100L, tieBreak = Seq("id"))
        .select("k", "grid_us", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(got === Seq(("a", 100L, "second"), ("a", 200L, "second")),
        s"parts=$parts")
    }
  }

  test("counterIncrease: growth, plateau, reset-to-lower credits the new value, first null") {
    val df = Seq(
      ("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 9L),  // +0, +4
      ("a", 4L, 2L),                                // reset: increase = 2
      ("a", 5L, 6L),                                // +4
      ("b", 1L, 7L)                                 // only sample: null
    ).toDF("k", "ts", "c")
    val got = Series.counterIncrease(df, Seq("k"), "ts", "c")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).sorted.toSeq
    assert(got === Seq(
      ("a", 1L, None), ("a", 2L, Some(0L)), ("a", 3L, Some(4L)),
      ("a", 4L, Some(2L)), ("a", 5L, Some(4L)), ("b", 1L, None)))
  }
}
