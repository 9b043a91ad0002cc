package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations, compiled to ONE aggregation pass.
  *
  * The reference validates per-entity configuration before running a pipeline
  * (internal/config/config.go:135-168 `Validate()`, the F5 family); the data
  * analog every large-scale ingest needs is validating the TABLE before
  * trusting a drop: completeness, uniqueness, ranges, pattern conformance,
  * domain containment. This module is the declarative form of that check
  * suite (the public shape popularized by AWS Deequ / Great Expectations),
  * re-expressed Spark-first:
  *
  *   - every check compiles to integer *violation-count* aggregates over the
  *     same single `agg(...)` — one scan, one shuffle, constant state per
  *     check, map-side partial aggregation. No per-check pass, no driver
  *     loop: 40 checks over 100 TB cost the same scan as one.
  *   - the one-row aggregate is exploded back into one row PER CHECK, so the
  *     verdict table is itself relational (joinable against a history of
  *     runs, alertable with a filter).
  *   - thresholds are parts-per-million integers and verdicts compare
  *     `violations * 1e6 <= threshold_ppm * denom` in exact bigint
  *     arithmetic — no float ratios, so Spark and any oracle agree bit-for-bit.
  *
  * Vacuous edge: a check over an empty denominator (all-null column, empty
  * table) passes — 0 <= 0 — matching SQL's universal quantification over the
  * empty set. Guard with `Complete` if emptiness itself is a failure.
  */
object Expectations {

  sealed trait Check {
    /** Stable row id in the verdict table. */
    def name: String
    def column: String
  }

  /** Non-null fraction of `column` over ALL rows >= minRatio. */
  final case class Complete(column: String, minRatio: Double = 1.0)
      extends Check { val name = s"complete_$column" }

  /** No duplicate non-null values in `column`. Violations = surplus rows
    * beyond one per distinct value (count - countDistinct). */
  final case class Unique(column: String) extends Check {
    val name = s"unique_$column"
  }

  /** Every non-null value of numeric `column` in [lo, hi]. */
  final case class InRange(column: String, lo: Long, hi: Long) extends Check {
    val name = s"range_$column"
  }

  /** Fraction of non-null values of `column` matching `pattern` (Java regex,
    * anchor with ^...$ for full-match) >= minRatio. */
  final case class Matches(column: String, pattern: String,
      minRatio: Double = 1.0) extends Check { val name = s"matches_$column" }

  /** Every non-null value of `column` drawn from `allowed`. */
  final case class OneOf(column: String, allowed: Seq[String]) extends Check {
    require(allowed.nonEmpty, s"OneOf($column): empty allowed set")
    val name = s"one_of_$column"
  }

  private def thresholdPpm(minRatio: Double): Long = {
    require(minRatio >= 0.0 && minRatio <= 1.0,
      s"minRatio out of [0,1]: $minRatio")
    math.round((1.0 - minRatio) * 1e6)
  }

  /** Violation counter + denominator + allowed-slack for one check. All three
    * are plain bigint aggregates/constants so the whole suite rides one
    * hash-aggregate (Unique contributes the lone count(DISTINCT), which Spark
    * plans via Expand inside the same pass). */
  private def compile(c: Check): (Column, Column, Long) = c match {
    case Complete(col0, minRatio) =>
      (count(when(col(col0).isNull, 1)), count(lit(1)), thresholdPpm(minRatio))
    case Unique(col0) =>
      (count(col(col0)) - countDistinct(col(col0)), count(col(col0)), 0L)
    case InRange(col0, lo, hi) =>
      (count(when(col(col0).isNotNull &&
          (col(col0) < lit(lo) || col(col0) > lit(hi)), 1)),
        count(col(col0)), 0L)
    case Matches(col0, pattern, minRatio) =>
      (count(when(col(col0).isNotNull && !col(col0).rlike(pattern), 1)),
        count(col(col0)), thresholdPpm(minRatio))
    case OneOf(col0, allowed) =>
      (count(when(col(col0).isNotNull &&
          !col(col0).isInCollection(allowed), 1)),
        count(col(col0)), 0L)
  }

  /** Run the whole suite in one aggregation pass. Returns one row per check:
    * (check_name, col_name, violations, denom, threshold_ppm, passed) with
    * `passed` a 0/1 bigint (exact integer verdict, see module doc). Row order
    * follows `checks`. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val names = checks.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val compiled = checks.map(compile)
    val aggs = compiled.zipWithIndex.flatMap { case ((v, d, _), i) =>
      Seq(v.cast("long").as(s"v_$i"), d.cast("long").as(s"d_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zip(compiled).zipWithIndex.map {
      case ((c, (_, _, ppm)), i) =>
        struct(
          lit(c.name).as("check_name"),
          lit(c.column).as("col_name"),
          col(s"v_$i").as("violations"),
          col(s"d_$i").as("denom"),
          lit(ppm).as("threshold_ppm"),
          when(col(s"v_$i") * lit(1000000L) <= lit(ppm) * col(s"d_$i"), 1L)
            .otherwise(0L).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("c")).select(col("c.*"))
  }

  /** True iff every check in the verdict table passed — the gate a pipeline
    * run calls before promoting a drop. One tiny scan of the verdict. */
  def allPassed(verdict: DataFrame): Boolean =
    verdict.agg(min(col("passed"))).head().getLong(0) == 1L
}
