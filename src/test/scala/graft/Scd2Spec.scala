package graft

import graft.cdc.Scd2
import graft.temporal.TemporalJoin
import org.apache.spark.sql.functions._

/** SCD2 history semantics + the loop-closing property: a history built by
  * Scd2 enriches probes IDENTICALLY whether walked as-of (TemporalJoin
  * binary search on valid_from) or by interval containment (rangeJoin on
  * [valid_from, valid_to - 1]) — producer and both consumers agree. */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  test("fromChangelog: versions open at their ts, close at the next change, " +
      "deletes bound their predecessor and emit nothing; last version open") {
    val ch = Seq(
      ("a", 100L, 10L, "I", 1L),
      ("a", 180L, 18L, "U", 2L),
      ("a", 250L, 0L, "D", 3L),   // closes version 18, emits no row
      ("a", 300L, 30L, "I", 4L),  // reopens after the delete gap
      ("b", 400L, 40L, "I", 1L)
    ).toDF("k", "ts", "version", "op", "seq")
    val got = Scd2.fromChangelog(ch, Seq("k"), "seq", "op", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .toSet
    assert(got === Set(
      ("a", 10L, 100L, Some(180L), false),
      ("a", 18L, 180L, Some(250L), false), // closed BY the delete's timestamp
      ("a", 30L, 300L, None, true),
      ("b", 40L, 400L, None, true)))
  }

  test("as-of enrichment == interval-containment over the Scd2 history (delete-free)") {
    val sfDir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("e_us"))
    val snaps = e
      .withColumn("bkt", expr("e_us div 21600000000L"))
      .filter(col("bkt") % 4 === length(col("event_type")) % 4)
      .select(col("event_type"), col("bkt").as("version"),
        (col("bkt") * 21600000000L).as("snap_us"))
      .distinct()
    val maxUs = e.agg(max(col("e_us"))).head().getLong(0)

    val hist = Scd2.fromChangelog(
      snaps.withColumn("op", lit("U")).withColumn("seq", col("snap_us")),
      Seq("event_type"), "seq", "op", "snap_us")
    // closed containment interval: [valid_from, valid_to - 1]; the open
    // (current) version extends to the probe horizon
    val ivs = hist.select(col("event_type"), col("version").as("iv_version"),
      col("valid_from"),
      coalesce(col("valid_to") - 1, lit(maxUs)).as("v_end"))

    val viaAsof = TemporalJoin.asofJoin(e, snaps, Seq("event_type"), "e_us", "snap_us")
      .filter(col("version").isNotNull)
      .select(col("event_id"), col("version"))
    val viaRange = TemporalJoin.rangeJoin(e, ivs, Seq("event_type"),
        "e_us", "valid_from", "v_end", bucketWidth = 21600000000L)
      .select(col("event_id"), col("iv_version").as("version"))
    assert(viaAsof.count() > 0)
    assert(viaAsof.exceptAll(viaRange).isEmpty && viaRange.exceptAll(viaAsof).isEmpty)
  }
}
