package graft

import org.apache.spark.sql.functions._
import graft.quality.Expectations
import graft.quality.Expectations._

class ExpectationsSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = Seq(
    // (id, name, score, tag)
    (1L, Some("alice"), 10L, Some("a")),
    (2L, Some("bob"), 20L, Some("b")),
    (3L, None, 150L, Some("a")),     // null name; score out of [0,100]
    (4L, Some("carol"), 30L, Some("zz")), // tag outside domain
    (4L, Some("Dave"), 40L, None)    // dup id; name breaks ^[a-z]+$
  ).toDF("id", "name", "score", "tag")

  private def verdictMap(checks: Seq[Check]) =
    Expectations.validate(fixture, checks).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("each check family counts violations exactly and verdicts in integer ppm") {
    val m = verdictMap(Seq(
      Complete("name", 0.8),           // 1 null / 5 rows = 0.2 nulls <= 0.2 → pass
      Complete("tag", 0.9),            // 1 null / 5 rows → fail
      Unique("id"),                    // 5 non-null, 4 distinct → 1 violation
      InRange("score", 0, 100),        // 150 → 1 violation
      Matches("name", "^[a-z]+$", 0.75), // Dave among 4 non-null → exactly at threshold
      OneOf("tag", Seq("a", "b", "c")) // zz → 1 violation
    ))
    assert(m("complete_name") === ((1L, 5L, 200000L, 1L)))
    assert(m("complete_tag") === ((1L, 5L, 100000L, 0L)))
    assert(m("unique_id") === ((1L, 5L, 0L, 0L)))
    assert(m("range_score") === ((1L, 5L, 0L, 0L)))
    assert(m("matches_name") === ((1L, 4L, 250000L, 1L)))
    assert(m("one_of_tag") === ((1L, 4L, 0L, 0L)))
  }

  test("allPassed gates on the worst row; a clean suite passes it") {
    val mixed = Expectations.validate(fixture,
      Seq(Complete("id"), Unique("id")))
    assert(!Expectations.allPassed(mixed))
    val clean = Expectations.validate(fixture,
      Seq(Complete("id"), InRange("score", 0, 1000)))
    assert(Expectations.allPassed(clean))
  }

  test("vacuous edge: empty table and all-null column pass (0 <= 0), Complete still catches emptiness via null-count over zero rows") {
    val empty = fixture.filter(lit(false))
    val v = Expectations.validate(empty,
      Seq(Unique("id"), InRange("score", 0, 1), Complete("name")))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(v.values.forall(_ == 1L)) // universal quantification over empty set
    val allNull = fixture.withColumn("name", lit(null).cast("string"))
    val v2 = Expectations.validate(allNull,
      Seq(Matches("name", "x", 1.0), Complete("name", 0.5)))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(v2("matches_name") === 1L) // no non-null values → vacuous pass
    assert(v2("complete_name") === 0L) // but completeness counts the nulls
  }

  test("whole suite is ONE aggregation pass: a single pair of HashAggregates around one Exchange (plus the distinct rewrite), never one scan per check") {
    val plan = Expectations.validate(fixture, Seq(
      Complete("name"), Unique("id"), InRange("score", 0, 100),
      Matches("name", "^[a-z]+$"), OneOf("tag", Seq("a", "b"))
    )).queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size +
      "Scan ExistingRDD".r.findAllIn(plan).size
    assert(scans === 1, s"expected one scan, plan:\n$plan")
  }

  test("duplicate check names and bad ratios are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Expectations.validate(fixture, Seq(Unique("id"), Unique("id")))
    }
    intercept[IllegalArgumentException] {
      Expectations.validate(fixture, Seq(Complete("id", 1.2)))
    }
    intercept[IllegalArgumentException] {
      Expectations.validate(fixture, Seq.empty)
    }
  }
}
