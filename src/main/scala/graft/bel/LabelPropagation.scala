package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** Synchronous label propagation (Raghavan, Albert & Kumara 2007, the
  * LPA community-detection baseline; GraphX ships the same synchronous
  * variant) — the third iterative graph operator beside
  * [[ConnectedComponents]] and [[PageRank]]. Communities are the
  * curation-side grouping CC cannot give: CC merges anything connected,
  * LPA splits a connected graph into densely-linked clusters (domain
  * groups, topic clusters, near-duplicate families with internal
  * structure).
  *
  * Determinism contract (what makes the result oracle-checkable): fixed
  * iteration count, SYNCHRONOUS updates (every node updates from the
  * previous round's labels — no update-order dependence), and a total
  * tie-break — each node adopts the neighbor label with the highest
  * count, smallest label on ties (one orderable-struct min, the
  * [[graft.ops.Cdc]] discipline — no window, map-side combinable). The
  * same graph yields the same labels on every run and partitioning;
  * the classic LPA caveat (synchronous updates can oscillate on
  * bipartite structures) is the price of determinism and is why the
  * iteration count is fixed rather than convergence-tested.
  *
  * Scale shape: labels carry the NODE value itself (strings at
  * dimension scale; a 10⁹-node deployment would dict-encode to longs
  * first — the [[PageRank]] posture); each iteration is one equi-join
  * of the undirected edge set against the label vector + two
  * hash-aggregations keyed on node — the minimal synchronous-step
  * shape — under per-iteration lineage cuts (the iterative-plan
  * discipline measured in [[PageRank]]).
  */
object LabelPropagation {

  /** Undirected simple-graph canonicalization shared with
    * [[Modularity]] (whose scores must be over EXACTLY this graph):
    * both directions, nulls and self-loops dropped, de-duplicated —
    * `(u, v)` with every edge present in both orientations. */
  private[bel] def undirectedSimple(edges: DataFrame): DataFrame =
    edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .filter(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .distinct()

  /** edges(src, dst) → (node, label) after `iterations` synchronous
    * rounds; label values are node values (community = the label its
    * members agreed on). Edges are undirected and de-duplicated;
    * self-loops drop (a node is not its own neighbor); isolated
    * endpoints keep their own label. */
  def run(edges: DataFrame, iterations: Int = 5,
          cutEvery: Int = 2): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(cutEvery >= 1, s"cutEvery must be >= 1, got $cutEvery")
    val und = undirectedSimple(edges).persist()
    val nodes = und.select(col("u").as("node")).distinct().persist()
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (i <- 1 to iterations) {
      val counts = und
        .join(labels.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // (cnt desc, label asc) via one orderable-struct min — no window
      val best = counts
        .groupBy("node")
        .agg(min(struct((-col("cnt")).as("nc"), col("label"))).as("b"))
        .select(col("node"), col("b.label").as("new_label"))
      val updated = labels
        .join(best, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
      // unlike PageRank's doubly-referenced step, `updated` is consumed
      // ONCE by the next round — an un-cut pair of steps re-evaluates
      // nothing, so batching cuts only trades plan depth for jobs
      labels = if (i % cutEvery == 0 && i != iterations)
        Checkpoints.cut(updated) else updated
    }
    val out = Checkpoints.cut(labels)
    und.unpersist()
    nodes.unpersist()
    out
  }
}
