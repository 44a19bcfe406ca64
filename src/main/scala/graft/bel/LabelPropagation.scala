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
  * Scale shape: the loop runs DICT-ENCODED — node values map to longs
  * once at entry ([[orderedIds]]) and map back once at the rim,
  * so every in-loop exchange hashes 8-byte keys instead of re-shuffling
  * raw node/label values round after round (the [[PageRank]] encode
  * posture; at 10⁹ nodes the value shuffle is the loop's whole cost).
  * Unlike PageRank's hash encode, the ids here are ORDER-PRESERVING
  * (global sort + per-partition index at entry): the label is part of
  * the tie-break, so `min(label_id)` must agree with `min(label_value)`
  * — a hash encode would change which label wins ties. Each iteration
  * is then one equi-join of the encoded edge set against the label
  * vector + two hash-aggregations keyed on longs — the minimal
  * synchronous-step shape — under per-iteration lineage cuts (the
  * iterative-plan discipline measured in [[PageRank]]).
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

  /** Order-preserving id dictionary `(node, id)` for a one-column
    * frame: ids are longs STRICTLY ASCENDING in `node` order —
    * range-repartition + in-partition sort, then
    * `monotonically_increasing_id` (ascending partition index in the
    * high bits, ascending row position in the low bits, and range
    * partitions are ordered by index — so the composite is globally
    * monotone). Not dense, and not the same values across runs — but
    * `min(id)` over any subset picks the same element as `min(node)`,
    * which is the only property the LPA tie-break needs and the one a
    * hash encode cannot give. Chosen over the distributed-zipWithIndex
    * idiom because it skips the partition-sizing job and the RDD
    * round-trip (stays codegen'd, one shuffle total). */
  private[bel] def orderedIds(nodes: DataFrame): DataFrame =
    nodes.repartitionByRange(col("node"))
      .sortWithinPartitions("node")
      .withColumn("id", monotonically_increasing_id())

  /** ONE synchronous LPA round over the ENCODED graph: `e` is `(u, v)`
    * long pairs (both orientations present), `labels` is `(node, label)`
    * longs. Exposed for the plan pin: every exchange this step plans
    * must hash on long keys. */
  private[bel] def step(e: DataFrame, labels: DataFrame): DataFrame = {
    val counts = e
      .join(labels.select(col("node").as("v"), col("label")), Seq("v"))
      .groupBy(col("u").as("node"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    // (cnt desc, label asc) via one orderable-struct min — no window
    val best = counts
      .groupBy("node")
      .agg(min(struct((-col("cnt")).as("nc"), col("label"))).as("b"))
      .select(col("node"), col("b.label").as("new_label"))
    labels
      .join(best, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("new_label"), col("label")).as("label"))
  }

  /** edges(src, dst) → (node, label) after `iterations` synchronous
    * rounds; label values are node values (community = the label its
    * members agreed on). Edges are undirected and de-duplicated;
    * self-loops drop (a node is not its own neighbor); isolated
    * endpoints keep their own label. */
  def run(edges: DataFrame, iterations: Int = 5,
          cutEvery: Int = 2): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(cutEvery >= 1, s"cutEvery must be >= 1, got $cutEvery")
    val und = undirectedSimple(edges)
    // entry encode: order-preserving dict, then the edge list as longs.
    // Two dimension-sized joins, paid ONCE — every round then shuffles
    // 16-byte rows instead of value pairs.
    val dict = Checkpoints.cut(
      orderedIds(und.select(col("u").as("node")).distinct()))
    val e = Checkpoints.cut(und
      .join(dict.select(col("node").as("u"), col("id").as("__u")), Seq("u"))
      .join(dict.select(col("node").as("v"), col("id").as("__v")), Seq("v"))
      .select(col("__u").as("u"), col("__v").as("v")))
    var labels = dict.select(col("id").as("node"), col("id").as("label"))
    for (i <- 1 to iterations) {
      val updated = step(e, labels)
      // unlike PageRank's doubly-referenced step, `updated` is consumed
      // ONCE by the next round — an un-cut pair of steps re-evaluates
      // nothing, so batching cuts only trades plan depth for jobs
      labels = if (i % cutEvery == 0 && i != iterations)
        Checkpoints.cut(updated) else updated
    }
    val enc = Checkpoints.cut(labels)
    // rim decode: ids back to node VALUES for both columns (labels are
    // node values in the contract)
    enc
      .join(dict.select(col("id").as("node"), col("node").as("__n")),
        Seq("node"))
      .join(dict.select(col("id").as("label"), col("node").as("__l")),
        Seq("label"))
      .select(col("__n").as("node"), col("__l").as("label"))
  }
}
