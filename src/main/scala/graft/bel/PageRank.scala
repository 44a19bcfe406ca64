package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** Damped PageRank over an edge DataFrame — the second iterative graph
  * operator beside [[ConnectedComponents]] (the reference's graph
  * summaries stop at networkx-style stats; rank centrality is what a
  * web-scale curation pipeline actually consumes — e.g. Common Crawl
  * publishes harmonic/PageRank host ranks and CCNet-style pipelines cut
  * on them as a quality prior).
  *
  * Fixed-iteration damped power method (Page et al. 1999) on the DISTINCT
  * directed edge set, with the standard dangling-mass redistribution:
  * rank' = (1−d)/N + d·(Σ_in rank/outdeg + danglingMass/N). Fixed
  * iteration count, not a convergence test: the result is a
  * deterministic function of the graph, so it can be oracle-checked
  * value-exactly, and the plan is the same every run.
  *
  * Scale shape: nodes are dictionary-encoded to longs (xxhash64 — same
  * collision contract as [[ConnectedComponents]]); the (src, dst, outdeg)
  * adjacency is built ONCE, cached, and reused every iteration; each
  * iteration is one equi-join of the rank vector against the adjacency +
  * one hash-aggregation on dst — two shuffles keyed on node id, the
  * minimal shape for an unbucketed rank step (a production deployment at
  * 10⁹+ nodes would bucket-partition adjacency AND ranks on id to
  * eliminate the adjacency side's exchange; the dangling term rides the
  * SAME action as a 1-row crossJoined aggregate, never a per-iteration
  * driver round-trip). Lineage is cut eagerly per iteration — the
  * iterative-plan contract [[ConnectedComponents]] established.
  */
object PageRank {

  /** edges(src, dst) of any orderable type → (node, rank) after
    * `iterations` damped steps from the uniform vector. Self-loops count
    * as ordinary edges (a node can rank itself); parallel edges collapse
    * (DISTINCT edge set); nodes with no out-edges are dangling and
    * redistribute their mass uniformly. */
  def run(edges: DataFrame, iterations: Int = 8,
          damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .filter(col("node").isNotNull)
      .distinct()
      .withColumn("id", xxhash64(col("node")))
      .persist()
    val n = nodes.count().toDouble
    if (n == 0) return nodes.select(col("node"), lit(0.0).as("rank"))

    val e = edges.select(xxhash64(col("src")).as("u"),
        xxhash64(col("dst")).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .distinct()
    val outDeg = e.groupBy("u").agg(count(lit(1)).cast("double").as("deg"))
    // adjacency with out-degree attached, built once and reused k times
    val adj = e.join(outDeg, "u").persist()
    adj.count()

    val ids = nodes.select(col("id"))
    var ranks = ids.select(col("id"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = adj.join(ranks, adj("u") === ranks("id"))
        .groupBy(col("v").as("id"))
        .agg(sum(col("rank") / col("deg")).as("c"))
      // mass parked on dangling nodes (no out-edges) — 1-row aggregate
      // crossJoined into the rank plan, so it rides the iteration's cut
      // action instead of a driver collect per iteration
      val dangling = ranks
        .join(outDeg, ranks("id") === outDeg("u"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("m"))
      ranks = Checkpoints.cut(
        ids.join(contrib, Seq("id"), "left")
          .crossJoin(dangling)
          .select(col("id"),
            (lit((1.0 - damping) / n) +
              lit(damping) * (coalesce(col("c"), lit(0.0)) + col("m") / n))
              .as("rank")))
    }
    val out = nodes.join(ranks, Seq("id")).select(col("node"), col("rank"))
    nodes.unpersist()
    adj.unpersist()
    out
  }
}
