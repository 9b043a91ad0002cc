package graft

import graft.agg.Transitions
import org.apache.spark.sql.functions.col

/** Transition matrix: hand-computed counts/probabilities, per-key sequence
  * isolation, NULL-state hop dropping, floor-probability row sums, and
  * stability across partitionings. */
class TransitionsSpec extends SparkSpec {

  import spark.implicits._

  private def mk(rows: Seq[(String, Long, String)]) =
    rows.toDF("k", "t", "s")

  private def run(rows: Seq[(String, Long, String)], parts: Int = 4) =
    Transitions.matrix(mk(rows).repartition(parts), Seq("k"), Seq("t"), "s")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

  test("hand case: counts and milli-probabilities per from-state row") {
    // k1: a->b->a->c ; k2: a->b
    val got = run(Seq(("k1", 1L, "a"), ("k1", 2L, "b"), ("k1", 3L, "a"),
      ("k1", 4L, "c"), ("k2", 1L, "a"), ("k2", 2L, "b")))
    assert(got === Map(
      ("a", "b") -> (2L, 666L), // 2 of 3 from-a hops
      ("a", "c") -> (1L, 333L),
      ("b", "a") -> (1L, 1000L)))
  }

  test("sequences never cross keys; the first event of a key contributes nothing") {
    // without key isolation the k1-last -> k2-first hop would appear
    val got = run(Seq(("k1", 1L, "x"), ("k2", 2L, "y"), ("k2", 3L, "z")))
    assert(got === Map(("y", "z") -> (1L, 1000L)))
  }

  test("NULL states drop their hops (no NULL state, no phantom transitions)") {
    val df = Seq(("k", 1L, Some("a")), ("k", 2L, Option.empty[String]),
      ("k", 3L, Some("b"))).toDF("k", "t", "s")
    val got = Transitions.matrix(df, Seq("k"), Seq("t"), "s").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // a->NULL and NULL->b both touch a null state and drop; a->b was never
    // adjacent (lag does NOT skip the null row), so the matrix is empty
    assert(got === Set.empty[(String, String)], s"unexpected transitions: $got")
  }

  test("floor probabilities: each from-row sums to <= 1000, > 1000 - states") {
    val rows = (0 until 300).map(i =>
      ("k", i.toLong, Seq("a", "b", "c", "d")(i * 7 % 4)))
    val got = run(rows)
    val byFrom = got.toSeq.groupBy(_._1._1)
    for ((f, es) <- byFrom) {
      val s = es.map(_._2._2).sum
      assert(s <= 1000L && s > 1000L - es.size, s"from=$f sums to $s")
    }
  }

  test("bit-identical across partitionings") {
    val rows = (0 until 500).map(i =>
      (s"k${i % 7}", i.toLong, Seq("a", "b", "c")(i % 3)))
    assert(run(rows, 2) === run(rows, 13))
  }
}
