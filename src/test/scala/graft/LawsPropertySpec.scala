package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.cdc.{Cdc, Scd2}
import graft.temporal.{Sweep, TemporalJoin}

/** ScalaCheck-generated algebraic laws over the CDC + temporal families —
  * the fixed-fixture suites prove the semantics on hand-checked cases; these
  * prove them on ADVERSARIALLY RANDOM shapes (nulls, equal rows, missing
  * keys, deletes-first, touching endpoints) against independent Scala
  * reference models. Bare Gen with a fixed seed (no scalatestplus bridge in
  * the offline cache), so every run replays the same cases. */
class LawsPropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  // a keyed snapshot row: nullable long + nullable string values drawn from
  // SMALL domains so old/new collide (unchanged rows), differ (updates),
  // and miss (inserts/deletes) with real probability
  private val snapshotGen: Gen[Map[Long, (Option[Long], Option[String])]] = for {
    keys <- Gen.someOf(0L until 25L)
    vals <- Gen.listOfN(keys.size, Gen.zip(
      Gen.option(Gen.choose(0L, 3L)), Gen.option(Gen.oneOf("x", "y"))))
  } yield keys.zip(vals).toMap

  private def toSnapDf(m: Map[Long, (Option[Long], Option[String])]) =
    m.toSeq.map { case (k, (v1, v2)) => (k, v1, v2) }.toDF("k", "v1", "v2")

  test("law: applyChangelog(old, diffSnapshots(old, new)) == new, and diff is minimal") {
    for (seed <- 1L to 6L) {
      val oldM = sample(snapshotGen, seed)
      val newM = sample(snapshotGen, seed + 100)
      val (oldDf, newDf) = (toSnapDf(oldM), toSnapDf(newM))
      val diff = Cdc.diffSnapshots(oldDf, newDf, keys = Seq("k"))
      val roundTrip = Cdc.applyChangelog(oldDf, diff, Seq("k"), "seq", "op")
        .collect().map(r => (r.getLong(0),
          (if (r.isNullAt(1)) None else Some(r.getLong(1)),
            if (r.isNullAt(2)) None else Some(r.getString(2))))).toMap
      assert(roundTrip === newM, s"seed $seed")
      // minimality: exactly one row per key whose state differs, none else
      val changed = (oldM.keySet ++ newM.keySet)
        .filter(k => oldM.get(k) != newM.get(k))
      assert(diff.count() === changed.size, s"seed $seed")
      // self-diff is empty
      assert(Cdc.diffSnapshots(oldDf, oldDf, Seq("k")).isEmpty, s"seed $seed")
    }
  }

  // a changelog: per key, ops in seq order with ts = seq * 10 (event time
  // follows the sequence, the common CDC shape), random I/U/D mix —
  // deletes may lead, repeat, or close a key
  private case class Op(k: Long, seq: Long, op: String, version: Long)
  private val changelogGen: Gen[List[Op]] = for {
    nKeys <- Gen.choose(1, 8)
    perKey <- Gen.listOfN(nKeys, for {
      n <- Gen.choose(1, 6)
      ops <- Gen.listOfN(n, Gen.frequency(2 -> "I", 4 -> "U", 2 -> "D"))
    } yield ops)
  } yield perKey.zipWithIndex.flatMap { case (ops, k) =>
    ops.zipWithIndex.map { case (o, i) => Op(k.toLong, (i + 1).toLong, o, k * 100L + i) }
  }

  test("law: SCD2 point-in-time lookup == replaying the changelog (random ops incl. delete-first)") {
    for (seed <- 1L to 6L) {
      val ops = sample(changelogGen, seed)
      val hist = Scd2.fromChangelog(
        ops.map(o => (o.k, o.seq, o.op, o.version, o.seq * 10L))
          .toDF("k", "seq", "op", "version", "ts"),
        keys = Seq("k"), seqCol = "seq", opCol = "op", tsCol = "ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getBoolean(4)))
      // reference model: active version at t = last op with ts <= t, if
      // it is not a delete
      def modelAt(k: Long, t: Long): Set[Long] =
        ops.filter(o => o.k == k && o.seq * 10L <= t).sortBy(_.seq)
          .lastOption.collect { case o if o.op != "D" => o.version }.toSet
      // set-valued lookup: >1 match would mean overlapping validity
      // intervals, which the law must also catch
      def histAt(k: Long, t: Long): Set[Long] =
        hist.collect { case (hk, v, vf, vt, _) if hk == k && vf <= t && t < vt => v }.toSet
      val keys = ops.map(_.k).distinct
      for (k <- keys; t <- Seq(0L, 5L, 10L, 15L, 25L, 40L, 65L, 1000L))
        assert(histAt(k, t) === modelAt(k, t), s"seed $seed key $k t $t")
      // exactly one open version per key unless the last op deleted it
      for (k <- keys) {
        val open = hist.count(h => h._1 == k && h._5)
        val lastOp = ops.filter(_.k == k).maxBy(_.seq)
        assert(open === (if (lastOp.op == "D") 0 else 1), s"seed $seed key $k")
      }
    }
  }

  private val intervalsGen: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(0L, 80L)
    } yield (k, s, s + len))
  } yield rows

  test("law: binned overlapJoin == naive inequality join, any bucket width") {
    for (seed <- 1L to 5L; width <- Seq(1L, 7L, 64L, 1000L)) {
      val l = sample(intervalsGen, seed).zipWithIndex
        .map { case ((k, s, e), i) => (k, s, e, i.toLong) }
        .toDF("k", "ls", "le", "lid")
      val r = sample(intervalsGen, seed + 50).zipWithIndex
        .map { case ((k, s, e), i) => (k, s, e, i.toLong) }
        .toDF("k", "rs", "re", "rid")
      val got = TemporalJoin.overlapJoin(l, r, Seq("k"),
        "ls", "le", "rs", "re", bucketWidth = width)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      val naive = l.join(r, l("k") === r("k") && col("ls") <= col("re") &&
          col("rs") <= col("le"))
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      // exactly-once: multiset equality, not just set equality
      assert(got.sorted.toSeq === naive.sorted.toSeq, s"seed $seed width $width")
    }
  }

  test("law: two-level sweep == serial reference cumsum, random spans and block sizes") {
    for (seed <- 1L to 5L) {
      val spans = sample(intervalsGen, seed).map { case (_, s, e) => (s, e) }
      val df = spans.toDF("s", "e")
      val width = 10L
      val deltas = spans.flatMap { case (s, e) =>
        Seq(s / width -> 1L, (e / width + 1) -> -1L) }
        .groupBy(_._1).map { case (b, ds) => b -> ds.map(_._2).sum }
      val model = deltas.toSeq.sortBy(_._1)
        .scanLeft((Long.MinValue, 0L)) { case ((_, acc), (b, d)) => (b, acc + d) }
        .tail.map { case (b, a) => (b * width) -> a }.toMap
      for (blocks <- Seq(1, 5, 1 << 20)) {
        val got = Sweep.activeIntervals(df, "s", "e", width, blocks)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
        assert(got === model, s"seed $seed blocks $blocks")
      }
    }
  }

  test("law: fillForward == per-point latest-at-or-before reference, random series and steps") {
    for (seed <- 1L to 5L; step <- Seq(1L, 7L, 50L)) {
      // unique (k, ts) per the as-of contract
      val obs = sample(intervalsGen, seed)
        .map { case (k, s, _) => (k, s) }.distinct.zipWithIndex
        .map { case ((k, s), i) => (k, s, i.toLong) }
      if (obs.nonEmpty) {
        val got = graft.temporal.Series.fillForward(
          obs.toDF("k", "ts_us", "v"), Seq("k"), "ts_us", step)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
        val model = (for {
          (k, ks) <- obs.groupBy(_._1).toSeq
          lo = (ks.map(_._2).min + step - 1) / step
          hi = ks.map(_._2).max / step
          slot <- lo to hi
          ts = slot * step
        } yield (k, ts, ks.filter(_._2 <= ts).maxBy(_._2)._3)).sorted
        assert(got === model, s"seed $seed step $step")
      }
    }
  }

  test("law: counterIncrease == pairwise reference on random counter walks") {
    val walkGen: Gen[List[(String, Long, Long)]] = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b")
        c <- Gen.choose(0L, 9L)
      } yield (k, c))
    } yield rows.zipWithIndex.map { case ((k, c), i) => (k, i.toLong, c) }
    for (seed <- 1L to 5L) {
      val rows = sample(walkGen, seed)
      val got = graft.temporal.Series.counterIncrease(
        rows.toDF("k", "ts", "c"), Seq("k"), "ts", "c")
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).sorted.toSeq
      val model = rows.groupBy(_._1).toSeq.flatMap { case (_, ks) =>
        val s = ks.sortBy(_._2)
        s.zip(None +: s.map(x => Some(x._3))).map { case ((k, t, c), prev) =>
          (k, t, prev.map(p => if (c >= p) c - p else c))
        }
      }.sorted
      assert(got === model, s"seed $seed")
    }
  }

  test("law: union-window and broadcast-search as-of forms agree on random data") {
    for (seed <- 1L to 5L; staleness <- Seq(None, Some(30L))) {
      val probe = sample(intervalsGen, seed).zipWithIndex
        .map { case ((k, s, _), i) => (k, s, i.toLong) }.toDF("k", "ts", "pid")
      // unique (k, snap_ts) per the as-of contract
      val build = sample(intervalsGen, seed + 200)
        .map { case (k, s, _) => (k, s) }.distinct.zipWithIndex
        .map { case ((k, s), i) => (k, s, i.toLong) }.toDF("k", "snap_ts", "version")
      def res(df: org.apache.spark.sql.DataFrame) =
        df.select("pid", "version").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val a = res(TemporalJoin.asofJoin(probe, build, Seq("k"), "ts", "snap_ts", staleness))
      val b = res(TemporalJoin.asofJoinBroadcast(probe, build, Seq("k"), "ts", "snap_ts", staleness))
      assert(a === b, s"seed $seed staleness $staleness")
    }
  }
}
