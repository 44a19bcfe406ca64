package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental connected components — the graph twin of the incremental
  * dedup indexes: a persisted label index `(node, component)` (the output
  * of [[ConnectedComponents.run]]) absorbs a NEW edge batch without
  * recomputing the world. This is what keeps 100 TB graph maintenance
  * (entity resolution, duplicate clusters, citation graphs) from
  * re-running the full O(log n)-round star loop over every edge per
  * snapshot: the star loop re-runs only over the SUPER-GRAPH of
  * components actually touched by new edges.
  *
  * Algorithm (standard union-find-on-summaries):
  *  1. Map each new edge's endpoints through the index: a known node
  *     becomes its component label, an unknown node its own hashed id —
  *     two delta-sized equi-joins (at scale the index is bucketed by
  *     node, making these probes co-located; nothing here ever scans the
  *     prior EDGE set, which is the whole point).
  *  2. The mapped edges form the super-graph over component labels and
  *     new nodes; its components are exactly the merge groups. Run the
  *     alternating-star fixpoint on it — super-graph-sized, O(log)
  *     rounds over |delta| rows, not |graph|.
  *  3. Relabel: prior index rows re-map `component` through the
  *     super-star map (a delta-sized, broadcastable dimension — only
  *     touched components appear); delta-new nodes take their
  *     super-label or themselves. Untouched components pass through
  *     UNCHANGED — the index update is append + overwrite-touched, never
  *     a rewrite of the world.
  *
  * Label identity: [[ConnectedComponents.run]] labels a component with
  * the min xxhash64 id over its nodes, and the star fixpoint over merged
  * component labels yields the min over the merged labels — which IS the
  * min over the merged components' nodes. So folding a delta into the
  * index produces BIT-IDENTICAL labels to a from-scratch run over
  * base ∪ delta (the a28 gate pins this against an independent oracle
  * over the full graph), and folds compose: fold(fold(I, d1), d2) =
  * labels(base ∪ d1 ∪ d2).
  */
object IncrementalCC {

  /** Fold `newEdges` (src, dst — same node type as the index's `node`)
    * into `index` (node, component). Returns the updated full index:
    * every prior node plus every delta node, labeled as a from-scratch
    * run over the union graph would label them. */
  def fold(index: DataFrame, newEdges: DataFrame,
           maxIterations: Int = 30): DataFrame = {
    val lab = index.select(col("node"), col("component"))
    val e = newEdges.select(col("src"), col("dst"))
    // 1. endpoints → prior labels (or own hash for first-seen nodes)
    val mapped = e
      .join(lab.select(col("node").as("src"), col("component").as("cu")),
        Seq("src"), "left")
      .join(lab.select(col("node").as("dst"), col("component").as("cv")),
        Seq("dst"), "left")
      .select(coalesce(col("cu"), xxhash64(col("src"))).as("u"),
        coalesce(col("cv"), xxhash64(col("dst"))).as("v"))
    // 2. super-graph fixpoint (delta-sized); self-loops — an edge inside
    // one existing component — drop in canonicalize, exactly the
    // "nothing to merge" case
    val stars = ConnectedComponents.starFixpoint(
      ConnectedComponents.canonicalize(mapped), maxIterations)
    val superMap = stars
      .select(col("u").as("old"), col("v").as("relabel"))
      .unionByName(stars.select(col("v").as("old"),
        col("v").as("relabel")))
      .distinct()
    // 3a. prior rows: touched components re-map, the rest pass through
    val updated = lab
      .join(superMap.withColumnRenamed("old", "component"),
        Seq("component"), "left")
      .select(col("node"),
        coalesce(col("relabel"), col("component")).as("component"))
    // 3b. first-seen delta nodes: super-label, or themselves (a delta
    // self-loop on a new node yields a singleton — run() parity)
    val fresh = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .join(lab.select("node"), Seq("node"), "left_anti")
      .withColumn("id", xxhash64(col("node")))
      .join(superMap.withColumnRenamed("old", "id"), Seq("id"), "left")
      .select(col("node"),
        coalesce(col("relabel"), col("id")).as("component"))
    updated.unionByName(fresh)
  }
}
