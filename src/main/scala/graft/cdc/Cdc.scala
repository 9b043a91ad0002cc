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
    val winners = changeWinners(changelog, keys, seqCol)
    snapshot
      .join(winners.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(
        winners.filter(col(opCol) =!= "D").select(dataCols.map(col): _*))
  }

  /** One winning change row per key: highest seq, deterministic on ties
    * (ordered by every remaining column). */
  private def changeWinners(changelog: DataFrame, keys: Seq[String],
      seqCol: String): DataFrame = {
    val tiebreak = changelog.columns.filterNot(c => keys.contains(c) || c == seqCol)
      .map(col(_).desc).toSeq
    TopK.perGroup(changelog, keys.map(col),
      col(seqCol).desc +: tiebreak, k = 1, rankName = "__rn")
  }

  /** Incremental MAINTENANCE of a (count, sum) aggregate under a changelog —
    * the next snapshot's `groupBy(groupCol).agg(count, sum(valueCol))`
    * WITHOUT recomputing it from the next snapshot. The 100 TB story: a
    * nightly re-aggregation scans and shuffles the whole fact table; this
    * maintains the same result touching the snapshot exactly once with a
    * BROADCAST probe (no snapshot shuffle, no snapshot aggregation) plus
    * delta-sized shuffles:
    *
    *  - minus-deltas: snapshot ⋈ broadcast(winner keys) INNER join picks the
    *    superseded old rows (the planner streams the snapshot, builds the
    *    tiny winner set) → (-1, -value) per old row
    *  - plus-deltas: non-delete winners → (+1, +value), no join at all
    *  - deltas aggregate (delta-sized) and full-outer-merge into `oldAgg`
    *    (agg-sized); groups reaching count 0 disappear, new groups appear
    *
    * Result provably equals recomputation over [[applyChangelog]]'s output
    * (CdcSpec parity test; the driver oracle recomputes from scratch in
    * DuckDB). `oldAgg` must be the (groupCol, cntName, sumName) aggregate of
    * `snapshot`. */
  def maintainCountSum(oldAgg: DataFrame, snapshot: DataFrame, changelog: DataFrame,
      keys: Seq[String], groupCol: String, valueCol: String,
      seqCol: String, opCol: String,
      cntName: String = "n_rows", sumName: String = "total"): DataFrame =
    maintainAggs(oldAgg, snapshot, changelog, keys, groupCol,
      Seq(valueCol -> sumName), seqCol, opCol, cntName)

  /** Snapshot DIFF — the inverse of [[applyChangelog]]: compare two keyed
    * snapshots and emit the minimal changelog (one 'I'/'U'/'D' row per
    * changed key, nothing for unchanged rows) that replays `oldSnap` into
    * `newSnap`. This is how a pipeline that only receives periodic full
    * dumps (the common vendor-feed reality) manufactures a CDC feed for
    * every downstream consumer built here — [[applyChangelog]],
    * [[maintainAggs]], [[Scd2.fromChangelog]].
    *
    * Scale shape: ONE full-outer equi-join on the key (both sides shuffle
    * once — the irreducible cost of comparing two keyed sets), change
    * detection as a null-safe struct comparison in the projection (codegen,
    * no per-column joins), output sized by the DELTA, not the snapshots.
    * Round-trip law (CdcSpec): applyChangelog(old, diffSnapshots(old, new))
    * == new, for any two snapshots. All emitted rows carry `seq` so the
    * feed drops straight into the seq-ordered consumers. */
  def diffSnapshots(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      seq: Long = 1L, seqName: String = "seq", opName: String = "op"): DataFrame = {
    val dataCols = oldSnap.columns.toSeq
    require(newSnap.columns.toSeq == dataCols,
      s"snapshots must share a schema: ${dataCols} vs ${newSnap.columns.toSeq}")
    val vals = dataCols.filterNot(keys.contains)
    def side(df: DataFrame, tag: String) = df.select(
      keys.map(col) :+ struct(vals.map(col): _*).as(s"__$tag"): _*)
    // null-safe struct equality: a null column value compares equal to
    // itself (<=>), so nullable attributes never report phantom updates
    // using-columns full-outer join: Spark coalesces each key into ONE
    // output column, so unmatched rows from either side keep their key
    side(oldSnap, "o")
      .join(side(newSnap, "n"), keys, "full_outer")
      .withColumn(opName,
        when(col("__o").isNull, lit("I"))
          .when(col("__n").isNull, lit("D"))
          .when(!(col("__o") <=> col("__n")), lit("U")))
      .filter(col(opName).isNotNull)
      // D rows carry the OLD values (the key is what matters), I/U the new
      // — chosen by which SIDE matched, never per column: a per-column
      // coalesce would resurrect the old value under an update-to-null
      // (caught by the LawsPropertySpec round-trip law)
      .select(keys.map(col) ++
        vals.map(v => when(col("__n").isNull, col(s"__o.$v"))
          .otherwise(col(s"__n.$v")).as(v)) ++
        Seq(col(opName), lit(seq).as(seqName)): _*)
  }

  /** [[maintainCountSum]] generalized to ANY number of summed measures —
    * count plus one sum per `(valueCol, sumName)` pair, maintained in the
    * same single pass (the snapshot is still probed exactly once with one
    * broadcast winner set, the deltas still aggregate delta-sized; extra
    * measures add columns, never scans or shuffles). Averages need no
    * maintenance of their own: avg = sum/count is DERIVABLE from the
    * maintained pair, so derive it in the projection
    * (`q_incr_agg_multi` does — its oracle recomputes from scratch, proving
    * count, sums and the derived avg all at once). `oldAgg` must be the
    * (groupCol, cntName, sumNames*) aggregate of `snapshot`. */
  def maintainAggs(oldAgg: DataFrame, snapshot: DataFrame, changelog: DataFrame,
      keys: Seq[String], groupCol: String, measures: Seq[(String, String)],
      seqCol: String, opCol: String, cntName: String = "n_rows"): DataFrame = {
    require(measures.nonEmpty, "at least one (valueCol, sumName) measure")
    val winners = changeWinners(changelog, keys, seqCol)
    def d(i: Int) = s"__v$i"
    val minus = snapshot
      .join(broadcast(winners.select(keys.map(col): _*)), keys)
      .select(col(groupCol).as("__g") +: lit(-1L).as("__c") +:
        measures.zipWithIndex.map { case ((v, _), i) =>
          (-col(v)).cast("long").as(d(i)) }: _*)
    val plus = winners.filter(col(opCol) =!= "D")
      .select(col(groupCol).as("__g") +: lit(1L).as("__c") +:
        measures.zipWithIndex.map { case ((v, _), i) =>
          col(v).cast("long").as(d(i)) }: _*)
    val delta = minus.unionByName(plus)
      .groupBy(col("__g"))
      .agg(sum(col("__c")).as("__dc"),
        measures.indices.map(i => sum(col(d(i))).as(s"__d${i}")): _*)
    // null-safe <=>: with === a NULL group key never matches itself, so the
    // old row and its delta would land in two unmatched output rows
    oldAgg.join(delta, oldAgg(groupCol) <=> delta("__g"), "full_outer")
      .select(
        coalesce(col(groupCol), col("__g")).as(groupCol) +:
          (coalesce(col(cntName), lit(0L)) + coalesce(col("__dc"), lit(0L))).as(cntName) +:
          measures.zipWithIndex.map { case ((_, sumName), i) =>
            (coalesce(col(sumName), lit(0L)) + coalesce(col(s"__d$i"), lit(0L))).as(sumName)
          }: _*)
      .filter(col(cntName) > 0)
  }
}
