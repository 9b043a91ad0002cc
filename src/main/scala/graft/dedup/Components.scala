package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list → dedup GROUPS.
  *
  * Pair detectors (MinHashLSH / SimHash / cosine-LSH) emit edges; curation
  * needs the transitive closure — one canonical document per component, not
  * per pair (A near B, B near C ⇒ one group {A,B,C} even when A–C was never
  * scored).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the standard
  * shuffle-friendly formulation:
  *   large-star: every node sends its smaller-or-equal neighbors' min to its
  *               LARGER neighbors (edges (u→min) for each neighbor u > v);
  *   small-star: symmetric, toward smaller neighbors;
  *   iterate to fixpoint — O(log n) rounds on real graphs, each round two
  *   hash aggregations (map-side combined) on node id.
  * The loop is driver-side but touches only edge-set INVARIANTS — one
  * (count, hash-sum) aggregate row per round; edges themselves never leave
  * executors, and each round runs exactly one action.
  *
  * At 100 TB scale this is the right shape: each round shuffles (node,
  * candidate-parent) longs, never document text; skewed super-nodes are
  * exactly what large-star splits.
  *
  * Output: (id, component) with component = min doc id of the component —
  * deterministic, so DuckDB's recursive-CTE transitive closure is an exact
  * oracle at test scale.
  */
object Components {

  /** edges: (id_a, id_b) pairs (any orientation, duplicates fine).
    * Returns (id, component) for every node that appears in an edge. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession

    // undirected edge list, self-loops dropped. The LAZY localCheckpoint is
    // load-bearing: largeStar/smallStar reference the edge set 4+ times per
    // round, and round 1 would otherwise re-evaluate the caller's FULL edge
    // lineage once per reference — for LSH-derived edges that lineage is
    // the whole decode→band→pair pipeline (measured 92 s → 9 s on the
    // media-dedup graph). The checkpointed set is (long, long) rows — tiny
    // — tracked in `checkpointed` and freed with the per-round checkpoints
    // when the call completes.
    var g = edges.select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .union(edges.select(col("id_b").cast("long").as("u"), col("id_a").cast("long").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = false)

    def largeStar(e: DataFrame): DataFrame = {
      // over the UNDIRECTED adjacency (the loop state is oriented big→small,
      // so symmetrize first): for each center u, m = min(neighbors ∪ {u});
      // emit (v, m) for every strictly LARGER neighbor v
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy(col("u")).agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // orient toward larger: (big, small); for each big node, connect all
      // its small neighbors (and itself) to the minimum
      val o = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
      val m = o.groupBy(col("u")).agg(min(col("v")).as("m"))
      o.join(m, "u")
        .select(col("v").as("n"), col("m"))
        .union(o.join(m, "u").select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .distinct()
        .select(col("n").as("u"), col("m").as("v"))
    }

    // Fixpoint detection by INVARIANTS of the canonical edge set, not set
    // difference: both sides of the comparison are distinct canonicalized
    // sets, so (count, Σ xxhash64(u,v)) equality identifies them up to a
    // ~2^-64 hash-sum collision — and it costs ONE tiny aggregate job per
    // round, where the round-2 formulation paid two extra `exceptAll`
    // shuffles per round just to observe convergence. The sum runs in
    // decimal(38,0) so it cannot overflow (ANSI mode) at any edge count.
    var iter = 0
    var converged = false
    var prevCount = -1L
    var prevHashSum: java.math.BigDecimal = null
    val checkpointed = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // the INITIAL local checkpoint must live as long as any iterate that may
    // recompute into it: rounds 1–4 are plain-cached and their recompute path
    // (cached block lost on executor failure) walks back to this checkpoint,
    // so unpersisting it at the end of round 1 — as the generic "free the
    // previous round" rule below would — destroys data with no recompute
    // path. Track it with the loop's checkpoint rounds and free it with them.
    checkpointed += g
    while (!converged && iter < maxIter) {
      val stepped = smallStar(largeStar(g))
      // cache truncates COMPUTE but not the logical plan, which otherwise
      // doubles per round; a LAZY localCheckpoint every 5 rounds truncates
      // lineage while keeping the invariant aggregate below as the round's
      // ONE materializing action (eager would run its own extra job)
      val isCheckpointRound = (iter + 1) % 5 == 0
      val next =
        if (isCheckpointRound) stepped.localCheckpoint(eager = false)
        else stepped.cache()
      // one job: materializes the cache AND computes the fixpoint invariants
      val inv = next.agg(
        count(lit(1)).as("n"),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("hs")).collect()(0)
      val cnt = inv.getLong(0)
      val hs = if (inv.isNullAt(1)) java.math.BigDecimal.ZERO
        else inv.getDecimal(1)
      // a locally-CHECKPOINTED round must keep its blocks until the whole
      // call finishes: unpersisting a local checkpoint destroys the data
      // (its lineage is truncated — unlike a plain cache there is no
      // recompute path), and a later round's cache eviction could still
      // need it. Plain-cache rounds unpersist immediately as before.
      if (checkpointed.lastOption.contains(g)) () else g.unpersist()
      if (isCheckpointRound) checkpointed += next
      g = next
      converged = cnt == prevCount && hs == prevHashSum
      prevCount = cnt
      prevHashSum = hs
      iter += 1
    }
    if (!converged) {
      (g +: checkpointed.toSeq).distinct.foreach(_.unpersist())
      throw new IllegalStateException(
        s"connectedComponents did not reach a fixpoint in maxIter=$maxIter rounds — " +
          "labels would be non-minimal; raise maxIter (real graphs converge in O(log n))")
    }

    // at fixpoint every node points directly at its component minimum
    val labels = g
      .select(greatest(col("u"), col("v")).as("id"), least(col("u"), col("v")).as("component"))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
      .union(
        // component minima themselves
        g.select(least(col("u"), col("v")).as("component")).distinct()
          .select(col("component").as("id"), col("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
      // materialize so the final round's cached edge set can be freed — the
      // round-2 version leaked one cached RDD per call (returned a lazy plan
      // over the cache and never unpersisted it)
      .localCheckpoint()
    (g +: checkpointed.toSeq).distinct.foreach(_.unpersist())
    labels
  }

  /** Dedup groups for a document table: MinHash-LSH pair detection →
    * connected components → (doc_id, group) where group = min doc_id of the
    * near-duplicate cluster (singletons included, group = own id). */
  def dedupGroups(docs: DataFrame, params: MinHashLSH.Params = MinHashLSH.Params()): DataFrame = {
    val pairs = MinHashLSH.nearDupPairs(docs, params).select(col("id_a"), col("id_b"))
    val comp = connectedComponents(pairs)
    val d = docs.select(col("doc_id").cast("long").as("doc_id"))
    d.join(comp, d("doc_id") === comp("id"), "left")
      .select(d("doc_id"),
        coalesce(col("component"), d("doc_id")).as("group"))
  }
}
