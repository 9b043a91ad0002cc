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
  * The loop is driver-side but touches only edge COUNTS (one `count()` per
  * convergence check); edges themselves never leave executors.
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

    // undirected edge list, self-loops dropped
    var g = edges.select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .union(edges.select(col("id_b").cast("long").as("u"), col("id_a").cast("long").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()

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

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(g)).cache()
      next.count() // materialize before comparing/unpersisting the parent
      // fixpoint: the edge set is stable (both are canonicalized distinct sets)
      val changed = next.exceptAll(g).limit(1).count() + g.exceptAll(next).limit(1).count()
      g.unpersist()
      g = next
      converged = changed == 0
      iter += 1
    }

    // at fixpoint every node points directly at its component minimum
    g.select(greatest(col("u"), col("v")).as("id"), least(col("u"), col("v")).as("component"))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
      .union(
        // component minima themselves
        g.select(least(col("u"), col("v")).as("component")).distinct()
          .select(col("component").as("id"), col("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
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
