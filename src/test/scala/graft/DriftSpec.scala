package graft

import graft.quality.Drift
import org.apache.spark.sql.functions._

/** Profile exactness (one-pass long-format stats), every drift status on a
  * hand-built before/after pair, integer basis-point math, and the
  * empty/zero-distinct edges. */
class DriftSpec extends SparkSpec {

  import spark.implicits._

  test("profile: exact rows/nulls/distinct and Spark dtype per column") {
    val df = Seq(
      (1L, Some("a"), Some(10L)), (2L, Some("b"), None),
      (3L, Some("a"), Some(30L)), (4L, None, Some(30L)))
      .toDF("id", "s", "v")
    val p = Drift.profile(df, exactDistinct = true).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p("id") === (("bigint", 4L, 0L, 4L)))
    assert(p("s") === (("string", 4L, 1L, 2L)))
    assert(p("v") === (("bigint", 4L, 1L, 2L)))
  }

  test("profile: approx mode tracks exact distinct within HLL tolerance") {
    val df = (0 until 5000).map(i => i.toLong).toDF("id")
    val d = Drift.profile(df).collect().head.getLong(4)
    assert(math.abs(d - 5000L) <= 500L, s"approx distinct way off: $d")
  }

  test("drift: every status fires on the right column") {
    val before = Drift.profile(Seq(
      (1L, "x", 1L, "k1"), (2L, "y", 2L, "k2"), (3L, "z", 3L, "k3"))
      .toDF("id", "s", "old_col", "key"), exactDistinct = true)
    // after: old_col dropped, new_col added, s re-typed to bigint, key's
    // distinct count collapsed 3 -> 1, id unchanged
    val after = Drift.profile(Seq(
      (1L, 7L, 10L, "k1"), (2L, 8L, 20L, "k1"), (3L, 9L, 30L, "k1"))
      .toDF("id", "s", "new_col", "key"), exactDistinct = true)
    val got = Drift.drift(before, after).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "id" -> "stable", "s" -> "type_changed", "old_col" -> "dropped",
      "new_col" -> "added", "key" -> "drifted"))
  }

  test("drift: null-rate shift in exact basis points trips maxNullDeltaBp") {
    val mk = (nulls: Int) => Drift.profile(
      (0 until 200).map(i => if (i < nulls) None else Some(i.toLong))
        .toDF("v"), exactDistinct = true)
    // 3 of 200 null = 150 bp; threshold 100 bp -> drifted, exact delta
    val r = Drift.drift(mk(0), mk(3)).collect().head
    assert(r.getString(1) === "drifted")
    assert(r.getAs[Long]("null_delta_bp") === 150L)
    // under a 200 bp threshold the same shift is stable
    assert(Drift.drift(mk(0), mk(3), maxNullDeltaBp = 200)
      .collect().head.getString(1) === "stable")
  }

  test("drift: zero-to-positive distinct flip always trips; empty table rates are 0") {
    val before = Drift.profile(
      Seq(Option.empty[Long], Option.empty[Long]).toDF("v"), exactDistinct = true)
    val after = Drift.profile(Seq(Some(1L), Some(2L)).toDF("v"), exactDistinct = true)
    val r = Drift.drift(before, after, maxNullDeltaBp = 20000).collect().head
    assert(r.getString(1) === "drifted", "0 -> 2 distinct must breach any ratio")
    val empty = Drift.profile(spark.range(0).select(col("id").as("v")),
      exactDistinct = true)
    val r2 = Drift.drift(empty, empty).collect().head
    assert(r2.getString(1) === "stable" && r2.getAs[Long]("null_delta_bp") === 0L)
  }
}
