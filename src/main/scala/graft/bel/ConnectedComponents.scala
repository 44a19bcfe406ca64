package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge DataFrame — the one
  * genuinely iterative algorithm the engine needs (A13; the reference calls
  * networkx on an in-memory graph, which caps out at single-machine scale).
  *
  * Algorithm: iterative minimum-label propagation. Each node starts with
  * label = xxhash64(node); every round each node takes the min label in its
  * closed neighborhood; stop when no label changes. Rounds are O(graph
  * diameter); each round is one shuffle on node id. `localCheckpoint`
  * every round truncates lineage so 20-round runs don't blow up the plan
  * (SURVEY §7.5).
  *
  * Edges are treated as undirected (matches networkx
  * `connected_components` on the underlying undirected view).
  */
object ConnectedComponents {

  /** edges(src, dst) of any orderable type → (node, component) where
    * `component` is the min initial label of the node's component. */
  def run(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    val spark = edges.sparkSession

    // undirected adjacency, self-loops dropped, deduped once up front
    val adj = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()

    var labels = adj.select(col("a").as("node")).distinct()
      .withColumn("component", xxhash64(col("node")))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // candidate label per node = min over neighbors' labels
      val neighborMin = adj
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min(col("component")).as("neighbor_component"))
      val updated = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("neighbor_component"),
            col("component"))).as("component"),
          (col("neighbor_component") < col("component")).as("changed"))
        .localCheckpoint(true)
      val nChanged = updated.filter(col("changed")).count()
      labels = updated.drop("changed")
      converged = nChanged == 0
      iter += 1
    }
    adj.unpersist()
    labels
  }

  def componentCount(edges: DataFrame): Long =
    run(edges).select("component").distinct().count()
}
