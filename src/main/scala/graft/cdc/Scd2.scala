package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history from a keyed changelog: one
  * VALIDITY INTERVAL per accepted version — the producer of the dimension
  * histories the as-of join ([[graft.temporal.TemporalJoin]]) consumes, and
  * the warehouse shape (valid_from / valid_to / is_current) every
  * point-in-time query walks.
  *
  * Semantics: per key, changes apply in `seqCol` order at event time
  * `tsCol`. Every non-delete row OPENS a version valid from its own
  * timestamp; the NEXT change (update or delete — anything that supersedes
  * it) closes it exclusively at its timestamp. The last version of a key is
  * open (`valid_to` null, `is_current` true) unless a delete closed it.
  * A delete emits no row of its own — its timestamp only bounds its
  * predecessor.
  *
  * Scale shape: ONE window over the key (a single hash exchange, the same
  * partitioning every per-key operator here reuses), `lead()` for the
  * closing bound — no self-join, no row multiplication, output exactly the
  * accepted versions. The consumer loop closes: enrich probes against this
  * history either as-of ([[graft.temporal.TemporalJoin.asofJoin]] on
  * `valid_from`) or by interval containment
  * ([[graft.temporal.TemporalJoin.rangeJoin]] on
  * [valid_from, valid_to - 1]) — Scd2Spec proves the two agree row-for-row
  * on a delete-free history. */
object Scd2 {

  /** `changelog`: key columns + value columns + `seqCol` (total order per
    * key; (key, seq) must be unique) + `opCol` ('D' closes, anything else
    * opens) + `tsCol` (event-time bigint, the validity axis — may equal
    * `seqCol`). Returns key + value columns + `valid_from` / `valid_to`
    * (null = open) / `is_current`. */
  def fromChangelog(changelog: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String, tsCol: String): DataFrame = {
    val vals = changelog.columns
      .filterNot(c => keys.contains(c) || c == seqCol || c == opCol || c == tsCol).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol))
    changelog
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .select(keys.map(col) ++ vals.map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }
}
