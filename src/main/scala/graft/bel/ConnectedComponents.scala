package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** Distributed connected components over an edge DataFrame — the one
  * genuinely iterative algorithm the engine needs (A13; the reference calls
  * networkx `connected_components` on an in-memory graph, which caps out at
  * single-machine scale).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log n) rounds on any graph, vs O(diameter) for naive min-label
  * propagation. Each round is two shuffles on node id. This is the same
  * algorithm GraphFrames uses for its `connectedComponents`.
  *
  * Nodes of any orderable type are first dictionary-encoded to longs via
  * `xxhash64` (collision probability ~n²/2⁶⁴ — negligible below ~10⁹ nodes;
  * at that scale switch the encoding to `zipWithIndex`).
  *
  * Edges are treated as undirected (matches networkx on the underlying
  * undirected view). A node whose only edge is a self-loop is still emitted
  * as a singleton component (networkx parity).
  */
object ConnectedComponents {

  /** Undirected long-id edge set, self-loops dropped, canonical (max,min)
    * orientation. NOT deduplicated and NOT cut: duplicate edges flow
    * through the first round pair emitting one output row per copy (the
    * window min is multiplicity-blind) and collapse at the pair-end
    * `distinct`, so a pre-loop `distinct` would buy nothing but one
    * extra full-edge-set shuffle and one extra materialization — the
    * two most expensive jobs of the whole loop, since every later round
    * runs on the (much smaller, exact-set) star frame. */
  private def hashedEdges(edges: DataFrame): DataFrame =
    canonicalize(edges
      .select(xxhash64(col("src")).as("u"), xxhash64(col("dst")).as("v")))

  /** (u,v) long edges → self-loop-free, canonical (max,min). Pure
    * projection — no shuffle. */
  private[bel] def canonicalize(ehash: DataFrame): DataFrame =
    ehash
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))

  /** Structural fixpoint test: a (deduplicated, canonically-oriented) edge
    * set is a fixpoint of the alternating-star map iff it is a disjoint
    * union of stars — every node appears AT MOST ONCE as a member (`u`)
    * and NEVER as both a member and a root (`v`). Necessity: a duplicate
    * member (one node pointing at two roots) or a member-root chain is
    * rewired by the next small-star round; sufficiency: large-star and
    * small-star are both the identity on a disjoint star union. Because
    * star rounds never merge or split components (Kiveris et al., SoCC'14,
    * Lemma 1 — edges are only rewired within a component), any REACHABLE
    * star-shaped set is the correct decomposition, so this replaces the
    * old run-one-more-pair-and-compare-fingerprints convergence test and
    * saves the entire confirming round pair. Cost: ONE aggregation job
    * over the (checkpointed, star-sized) frame — 2|S| narrow rows. */
  private def isStarSet(e: DataFrame): Boolean =
    e.select(col("u").as("id"), lit(1).as("m"))
      .unionByName(e.select(col("v").as("id"), lit(0).as("m")))
      .groupBy("id")
      .agg(sum(col("m")).as("times_member"), max(lit(1) - col("m")).as("is_root"))
      .filter(col("times_member") > 1 ||
        (col("times_member") >= 1 && col("is_root") === 1))
      .isEmpty

  /** One large-star + small-star round (Kiveris et al., SoCC'14).
    * Large-star: for each node u, connect every strictly-larger neighbor
    * to the minimum of N(u) ∪ {u}. Small-star: orient edges large→small;
    * connect every neighbor (and u itself) of each node u to the minimum
    * of its ≤-neighborhood.
    *
    * ARRAY-FREE (r13): both half-rounds used to build per-node
    * neighborhoods with `collect_set` — but at the fixpoint a
    * component's root has degree = component size, so the giant
    * component of a 100 TB graph materializes ONE component-sized array
    * in a single aggregation task's IN-MEMORY buffer (the same
    * unbounded per-key-state class as the dedup candidate generator's
    * r12 weak). The vehicle is now a WINDOW: `min(v)` over the node
    * partition rides WindowExec, whose per-partition-key buffer
    * (ExternalAppendOnlyUnsafeRowArray) SPILLS to disk — a celebrity
    * node costs time, never memory. Vehicles measured at sf0.1
    * (a13_components / a13_graph_stats / a28_incremental_cc solo,
    * min-of-3): collect_set array 1.19/1.83/2.35 s but OOM-class at
    * scale; min-agg + equi-join back 2.4/4.9/14.0 s (the join's probe
    * and the agg partial-aggregate produce DIFFERENT exchange subtrees
    * — no ReuseExchange — so the un-cut inner round re-executes per
    * consumer, compounding across the pair; an explicit shared
    * repartition repairs reuse but the per-round join still lost);
    * window 1.68/3.16/3.09 s — the keeper. The small-star window is
    * ONE pass: with `orderBy(v)`, the running min over an ascending
    * prefix IS the group minimum on every row, sharing the WindowExec
    * with `row_number` (whose rn = 1 row emits the "u itself joins m"
    * edge — no second aggregation, no union branch, exactly one output
    * struct per input row).
    *
    * Duplicate handling moved with it: collect_set deduped neighbor
    * multiplicity inside the aggregation, the window form instead lets
    * duplicates FLOW (each copy emits at most one copy — the min is
    * multiplicity-blind) and the pair-end `distinct` collapses them, so
    * multiplicity never amplifies within a pair and resets at every
    * cut. `dedup = false` skips the pair-INNER distinct exactly as
    * before; only the pair's OUTER round dedups, because the cut frame
    * must be an exact set for [[isStarSet]] (a duplicate member would
    * read as a violation) and for the fixpoint star-count aggregates. */
  private def starRound(e: DataFrame, dedup: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy("u")
    val wuo = Window.partitionBy("u").orderBy("v")
    val nbrs = e.select(col("u"), col("v"))
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val largeStar = nbrs
      .withColumn("m", least(col("u"), min(col("v")).over(wu)))
      .filter(col("v") > col("u") && col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val oriented = largeStar.select(
      greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val out = oriented
      .withColumn("rn", row_number().over(wuo))
      // running min over the ascending order = the group minimum on
      // EVERY row (prefix min of a sorted sequence), sharing wuo's one
      // WindowExec pass with row_number
      .withColumn("m", min(col("v")).over(wuo))
      .select(when(col("rn") === 1, struct(col("u"), col("m").as("v")))
        .otherwise(when(col("v") =!= col("m"),
          struct(col("v").as("u"), col("m").as("v")))).as("o"))
      .filter(col("o").isNotNull)
      .select(col("o.u").as("u"), col("o.v").as("v"))
    if (dedup) out.distinct() else out
  }

  /** Run the alternating-star loop to its fixpoint: returns the star edge
    * set (u = member, v = component-root = min id of the component).
    *
    * Two job-count fusions (the loop cost at toy/driver scale is jobs ×
    * fixed overhead; at cluster scale the same fusions remove full-edge-
    * set shuffles):
    *  - NO pre-loop cut/fingerprint of the input: duplicates ride
    *    through the first pair (multiplicity-blind window mins, one
    *    output row per copy) and collapse at its trailing distinct, so
    *    the old distinct+materialize of the FULL edge set — the two
    *    most expensive jobs, every later round being star-set-sized —
    *    is fused into round 1's shuffle.
    *  - TWO rounds per lineage cut, halving cut-job count; the inner
    *    round skips its trailing distinct (the outer pair-end distinct
    *    collapses everything at once). Within a pair the first round's
    *    self-union ends in an exchange, which Spark's ReuseExchange
    *    deduplicates, not recomputes.
    *  - Convergence is the STRUCTURAL [[isStarSet]] test on the cut frame,
    *    not compare-fingerprints-across-pairs: the old test could only
    *    observe the fixpoint by running one full extra (idempotent) star
    *    pair after it — ~6 shuffles over data the structural test settles
    *    with one star-sized aggregation job. */
  private[bel] def starFixpoint(e0: DataFrame, maxIterations: Int): DataFrame = {
    var e = e0
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      e = Checkpoints.cut(starRound(starRound(e, dedup = false)))
      // An empty star set (empty/self-loop-only input) is trivially fixed
      // and passes isStarSet (no rows, no violations).
      converged = isStarSet(e)
      iter += 2
    }
    // Exiting at maxIterations without the fixpoint would silently return
    // wrong labels; surface it loudly (callers see the warning, the labels
    // are best-effort). 30 rounds is far above the O(log n) bound, so this
    // only fires on a pathological input or a too-low caller override.
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connected components did NOT converge after $maxIterations " +
          "iterations; component labels may be incorrect")
    e
  }

  /** edges(src, dst) of any orderable type → (node, component). `component`
    * is an opaque label, equal for all nodes of one component. */
  def run(edges: DataFrame, maxIterations: Int = 30): DataFrame = {
    // All nodes, including isolated / self-loop-only ones. Single
    // consumer (the final join), so no persist — a cache here would
    // either leak past return or force the caller to recompute it
    // uncached after an unpersist.
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
      .withColumn("id", xxhash64(col("node")))

    val e = starFixpoint(hashedEdges(edges), maxIterations)

    // At the fixpoint the edge set is a union of stars rooted at each
    // component's min id: (u=member, v=root). Nodes absent from any edge
    // are their own root. The cut frame e feeds both branches, so the
    // only re-evaluated subplan is the caller's edge construction (once,
    // for nodes).
    val roots = e.select(col("u").as("id"), col("v").as("root"))
      .unionByName(e.select(col("v").as("id"), col("v").as("root")))
      .groupBy("id").agg(min("root").as("root"))
    nodes.join(roots, Seq("id"), "left")
      .select(col("node"), coalesce(col("root"), col("id")).as("component"))
  }

  /** Component COUNT without materializing labels: works entirely in the
    * hashed long-id domain — no string-node distinct, no label join, no
    * distinct over labels. At the fixpoint each non-singleton component is
    * one star, so the count is |distinct roots| plus the nodes that appear
    * in no (self-loop-free) edge at all. Saves ~1/3 of the A13 graph-stats
    * wall time vs `run(...).select("component").distinct.count`. */
  def componentCount(edges: DataFrame, maxIterations: Int = 30): Long =
    componentCountHashed(
      edges.select(xxhash64(col("src")).as("u"), xxhash64(col("dst")).as("v")),
      maxIterations)

  /** [[componentCount]] over edges ALREADY dictionary-encoded to long ids
    * (columns `u`, `v`) — lets a caller that needs the hashed frame for
    * other aggregates (e.g. [[Graph.stats]]) hash and cache it once. */
  private[graft] def componentCountHashed(ehash: DataFrame,
                                          maxIterations: Int = 30): Long =
    componentAndNodeCount(ehash, maxIterations)._1

  /** (component count, distinct-node count) in one pass — callers that
    * also need |V| (e.g. [[Graph.stats]]) get it from the SAME distinct
    * the singleton computation already runs, instead of paying a second
    * distinct-count aggregation (and, for multi-column distincts, a 3×
    * Expand) over the full edge set. */
  private[graft] def componentAndNodeCount(ehash: DataFrame,
                                           maxIterations: Int = 30): (Long, Long) = {
    val (summary, cleanup) = starSummary(ehash, maxIterations)
    val row = try summary.collect().head finally cleanup()
    (row.getLong(0) + row.getLong(1), row.getLong(2))
  }

  /** Runs the star loop to its fixpoint and returns the UN-COLLECTED
    * 1-row summary frame (n_roots, n_singletons, n_nodes) plus a cleanup
    * thunk (kept for interface stability; currently a no-op). All three
    * counts come from ONE tagged-union groupBy: every graph endpoint
    * (tag g), star member (tag m) and star root (tag r) lands in a single
    * per-id max-flag aggregation, whose 1-row rollup reads the counts off
    * the flags — n_roots = Σr, n_singletons = ids with neither m nor r,
    * n_nodes = |groups|. Replaces the old persist + anti-join + three
    * crossJoined countDistinct branches: one shuffle on id instead of
    * three aggregation branches over a persisted distinct-ids frame, so
    * both the toy-scale job count and the cluster-scale shuffle count
    * drop. (The star set's nodes are a subset of the graph's, so the
    * group count equals the distinct non-null endpoint count exactly;
    * star frames are null-free by construction — canonicalize drops null
    * endpoints.) A caller can still crossJoin further 1-row aggregates
    * (e.g. [[Graph.stats]]'s edge/citation counts) into the same action. */
  private[graft] def starSummary(ehash: DataFrame, maxIterations: Int = 30)
      : (DataFrame, () => Unit) = {
    val e = starFixpoint(canonicalize(ehash), maxIterations)
    val tagged = ehash.select(col("u").as("id"))
      .unionByName(ehash.select(col("v").as("id")))
      .filter(col("id").isNotNull) // null endpoint = no node (Graph.stats)
      .select(col("id"), lit(0).as("m"), lit(0).as("r"))
      .unionByName(e.select(col("u").as("id"), lit(1).as("m"), lit(0).as("r")))
      .unionByName(e.select(col("v").as("id"), lit(0).as("m"), lit(1).as("r")))
    val summary = tagged
      .groupBy("id")
      .agg(max(col("m")).as("m"), max(col("r")).as("r"))
      .agg(sum(col("r")).cast("long").as("n_roots"),
        count(when(col("m") === 0 && col("r") === 0, 1)).as("n_singletons"),
        count(lit(1)).as("n_nodes"))
    (summary, () => ())
  }
}
