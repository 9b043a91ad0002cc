package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.temporal.Anomaly.madFlags]] — the ONLINE
  * detector: each arriving sample is judged against its key's trailing
  * median/MAD baseline and the flag is emitted in the same micro-batch, the
  * alerting latency a batch job can't give (its hourly run IS the latency).
  *
  * `flatMapGroupsWithState` keyed by series key holds the minimal sufficient
  * state: the last `window` samples as a bounded ring (O(window) longs per
  * key — at a million keys × window 24 that's ~200 MB of state store, flat
  * forever). The ring stores Option values so the BATCH semantics carry
  * over exactly: a NULL sample occupies a slot (frames are row-based) but
  * never enters a baseline, and any frame containing one is judged
  * insufficient — StreamingAnomalySpec pins flag-for-flag parity with the
  * batch operator on the same data.
  *
  * Ordering contract: within a micro-batch rows are sorted by (t, v) per
  * key; ACROSS batches samples are judged against the state as of arrival —
  * a late row is scored against a baseline that already absorbed newer
  * samples (the online reality; the batch operator is the replay tool when
  * exact-order reprocessing matters). Same integer 2·median / 4·MAD
  * arithmetic as batch: no doubles, reshuffle-deterministic. */
object StreamingAnomaly extends Serializable {

  final case class Sample(key: String, t: Long, v: Option[Long])
  final case class Flagged(key: String, t: Long, v: Option[Long],
      med2: Option[Long], dev2: Option[Long], mad4: Option[Long],
      anomaly: Option[Int])

  /** Ring of the last `window` samples, oldest first. */
  final case class Ring(ring: Seq[Option[Long]])

  /** The batch operator's exact verdict over one trailing frame. */
  private[graft] def judge(ring: Seq[Option[Long]], v: Option[Long],
      window: Int, k: Int): (Option[Long], Option[Long], Option[Long], Option[Int]) = {
    val nonNull = ring.flatten
    if (ring.size < window || nonNull.size < window)
      (None, None, None, None) // warm-up or null-contaminated frame
    else {
      val sorted = nonNull.sorted
      val med2 = sorted((window - 1) / 2) + sorted(window / 2)
      val devs = nonNull.map(x => math.abs(2 * x - med2)).sorted
      val mad4 = devs((window - 1) / 2) + devs(window / 2)
      val dev2 = v.map(x => math.abs(2 * x - med2))
      (Some(med2), dev2, Some(mad4),
        dev2.map(d => if (2 * d > k.toLong * mad4) 1 else 0))
    }
  }

  /** @param maxGroupRowsPerTrigger same contract as
    *        [[StatefulLimiter.limitStream]]: the within-batch sort buffers
    *        the group, so a misbounded source trigger becomes an actionable
    *        error rather than an executor OOM. */
  def flagStream(samples: DataFrame, window: Int, k: Int,
      maxGroupRowsPerTrigger: Int = 4 << 20): Dataset[Flagged] = {
    require(window >= 4 && window <= 4096, s"window out of range: $window")
    require(k >= 1, s"k out of range: $k")
    val spark = samples.sparkSession
    import spark.implicits._
    samples.select("key", "t", "v").as[Sample]
      .groupByKey(_.key)
      .flatMapGroupsWithState[Ring, Flagged](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Sample], state: GroupState[Ring]) =>
          var ring = state.getOption.map(_.ring.toVector)
            .getOrElse(Vector.empty[Option[Long]])
          val buf = new scala.collection.mutable.ArrayBuffer[Sample]()
          rows.foreach { r =>
            if (buf.length >= maxGroupRowsPerTrigger)
              throw new IllegalStateException(
                s"key '$key' exceeded $maxGroupRowsPerTrigger rows in one trigger — " +
                  "bound the source trigger size or raise maxGroupRowsPerTrigger")
            buf += r
          }
          val out = buf.sortInPlaceBy(r => (r.t, r.v.getOrElse(Long.MinValue)))
            .map { r =>
              val (med2, dev2, mad4, anomaly) = judge(ring, r.v, window, k)
              ring = (ring :+ r.v).takeRight(window)
              Flagged(r.key, r.t, r.v, med2, dev2, mad4, anomaly)
            }
          state.update(Ring(ring))
          out.iterator
      }
  }
}
