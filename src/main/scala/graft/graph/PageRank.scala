package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the influence/centrality
  * score a curation pipeline runs over its derived graphs (supplier↔customer
  * activity, document citation/near-dup graphs, user interaction graphs):
  * which entities sit at the center of the data, for sampling weights,
  * spam-source triage, canonical-pick tie-breaking.
  *
  * INTEGER-DETERMINISTIC by construction: ranks are bigint fixed-point
  * (`scale` total mass), each hop contributes `rank div outdeg` and the
  * damped update is `base + damp·Σ div 100` — floor division everywhere, no
  * doubles. A float PageRank sums contributions in partition order and no
  * two runs agree bit-for-bit; this one is exactly reproducible under any
  * reshuffle AND exactly twinned by an unrolled SQL oracle. The cost is mass
  * leakage of < 1 ulp-of-scale per floor (bounded in PageRankSpec's
  * conservation law); at scale=10¹² that is noise at the 9th decimal.
  *
  * Shuffle shape per iteration: one join edges⋈ranks on src (both sides
  * pre-partitioned by the same key after round 1 under AQE), one hash
  * aggregation on dst, one left join back to the node set — all map-side
  * combinable longs, never payload data. The edge set, out-degrees and node
  * set are lazily local-checkpointed ONCE: the final plan references them
  * `iters` times, and without the checkpoint each reference would re-run the
  * caller's full edge-derivation lineage ([[graft.dedup.Components]] learned
  * this the hard way — 92 s → 9 s).
  *
  * Dangling nodes (out-degree 0) keep their base rank and forward nothing —
  * their damped mass leaks rather than redistributes (the simple PageRank
  * variant; callers wanting strict conservation symmetrize their edges, as
  * q_pagerank's bipartite graph does, making dangling nodes impossible).
  */
object PageRank {

  /** Ranks after exactly `iters` synchronous updates.
    *
    * @param edges (src, dst) directed edges, any duplicates (deduplicated
    *              internally; parallel edges would double-count mass).
    * @return (node, rank) for every node appearing in an edge; Σ rank ≲
    *         `scale` (floor losses only). */
  def ranks(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
      dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct out of range: $dampPct")
    val e = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .distinct().localCheckpoint(eager = false)
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(eager = false)
    val n = nodes.count()
    require(scale >= n, s"scale $scale below node count $n: every rank floors to 0")
    val base = scale * (100L - dampPct) / (100L * n)
    var rank = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iters) {
      val inSum = e.join(out, "src")
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      rank = nodes.join(inSum, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"${dampPct}L * coalesce(in_sum, 0L) div 100L"))
            .as("rank"))
    }
    rank
  }
}
