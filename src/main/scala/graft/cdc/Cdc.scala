package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.agg.TopK

/** Changelog compaction (the MERGE INTO / CDC-upsert shape): apply a stream
  * of keyed I/U/D change rows to a snapshot, producing the next snapshot.
  *
  * Semantics: per key, the change row with the HIGHEST sequence number wins
  * (late-arriving lower-seq rows are ignored); a winning 'D' removes the
  * key, any other op replaces-or-inserts the row. Snapshot rows whose key
  * never appears in the changelog pass through untouched.
  *
  * Scale shape: the changelog first collapses to one winner per key
  * ([[TopK.perGroup]] k=1 — WindowGroupLimit bounds every map task to one
  * row per key before the shuffle, so a hot key's 10⁶ updates never travel),
  * then ONE anti-join removes superseded snapshot rows and the winners union
  * in — two key-shuffles total on the snapshot side regardless of changelog
  * volume, and the planner broadcasts the winner set when it is small (the
  * common nightly-delta case). Applying the same changelog twice is
  * idempotent (the anti-join sees the same winners). */
object Cdc {

  /** `changelog` must carry `snapshot`'s columns plus `opCol` (values
    * 'I'/'U'/'D' — anything but 'D' upserts) and `seqCol` (a total order
    * within each key; ties broken by the row's remaining columns for
    * determinism). */
  def applyChangelog(snapshot: DataFrame, changelog: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    // deterministic winner even on seq ties: order by every column
    val tiebreak = changelog.columns.filterNot(c => keys.contains(c) || c == seqCol)
      .map(col(_).desc).toSeq
    val winners = TopK.perGroup(changelog, keys.map(col),
        col(seqCol).desc +: tiebreak, k = 1, rankName = "__rn")
    snapshot
      .join(winners.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(
        winners.filter(col(opCol) =!= "D").select(dataCols.map(col): _*))
  }
}
