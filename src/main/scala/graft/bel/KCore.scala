package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** k-core extraction: the maximal subgraph in which every node has degree
  * ≥ k — the graph-cohesion operator beside [[ConnectedComponents]]
  * (membership), [[PageRank]] (centrality) and [[Triangles]] (clustering).
  * The reference's graph summaries (`manager/abstract_manager.py:224`
  * summarize, networkx export `manager/bel_manager.py`) stop at counts;
  * core extraction is the standard next statistic the same edge surface
  * serves — dense-subgraph pruning of entity co-occurrence graphs before
  * expensive downstream analytics.
  *
  * Algorithm: distributed batch peeling (the MapReduce formulation of the
  * classic Matula–Beck peeling; cf. Montresor, De Pellegrini & Miorandi,
  * "Distributed k-Core Decomposition", IEEE TPDS 2013): repeatedly delete
  * EVERY node of current degree < k until none remains. Deleting in full
  * batches (not one node at a time) reaches the same fixpoint — the k-core
  * is the unique maximal subgraph with min-degree ≥ k, and batch deletion
  * only removes nodes provably outside it.
  *
  * Scale shape: each round is one hash-aggregation on node id (degrees)
  * plus two semi-joins re-keying the surviving edge set — all equi-key
  * shuffles, nothing all-pairs, no driver-side graph. Round count is the
  * peeling depth, which on power-law graphs is small (most nodes fall in
  * the first rounds); each round's edge set shrinks monotonically and is
  * lineage-cut so round r+1 never replays round r's plan. Node ids only
  * need to be orderable + hashable — they are grouped and joined, never
  * arithmetic on.
  *
  * Output: `(node, core_deg)` — the surviving nodes with their degree
  * INSIDE the core (≥ k by construction). Empty output = the graph has no
  * k-core.
  */
object KCore {

  def run(edges: DataFrame, k: Int,
          srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // canonical undirected simple graph: self-loops out, one row per
    // unordered pair (parallel edges would double-count degree)
    var e = Checkpoints.cut(edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct())
    var out: DataFrame = null
    while (out == null) {
      val deg = e.select(col("a").as("node"))
        .unionByName(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("core_deg"))
        .persist()
      if (deg.filter(col("core_deg") < k).isEmpty) {
        // fixpoint: materialize the answer, then release the cache
        out = Checkpoints.cut(deg)
        deg.unpersist()
      } else {
        val keep = deg.filter(col("core_deg") >= k).select("node")
        val e2 = Checkpoints.cut(e
          .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("node").as("b")), Seq("b"), "left_semi"))
        deg.unpersist()
        e = e2
      }
    }
    out
  }
}
