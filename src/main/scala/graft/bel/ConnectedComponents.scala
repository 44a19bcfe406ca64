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
    * orientation. NOT deduplicated and NOT cut: the first star round's
    * `collect_set` dedupes per neighborhood anyway, so a pre-loop
    * `distinct` would buy nothing but one extra full-edge-set shuffle and
    * one extra materialization — the two most expensive jobs of the whole
    * loop, since every later round runs on the (much smaller) star set. */
  private def hashedEdges(edges: DataFrame): DataFrame =
    canonicalize(edges
      .select(xxhash64(col("src")).as("u"), xxhash64(col("dst")).as("v")))

  /** (u,v) long edges → self-loop-free, canonical (max,min). Pure
    * projection — no shuffle. */
  private def canonicalize(ehash: DataFrame): DataFrame =
    ehash
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))

  // Unique observation names across all loops in one SparkSession.
  private val obsSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Eager lineage cut + convergence fingerprint in ONE job: the
    * (count, hash-sum) metrics ride the checkpoint-materialization action
    * as a `Dataset.observe` side-band instead of a second aggregation job
    * over the cut frame. (Eager cut itself: measured FASTER than letting a
    * downstream action materialize a lazy checkpoint — the loop's
    * self-union reads each round's frame twice, and eager blocks are in
    * place before both branches scan.) Collision probability ~2^-64 per
    * round; the fingerprint is over the canonicalized (max,min) edge set,
    * so orientation can't alias. */
  private def cutWithFingerprint(df: DataFrame): (DataFrame, (Long, Long)) = {
    val obs = org.apache.spark.sql.Observation(
      s"cc_fp_${obsSeq.incrementAndGet()}")
    val cut = Checkpoints.cut(df.observe(obs,
      count(lit(1)).as("n"), sum(xxhash64(col("u"), col("v"))).as("h")))
    val m = obs.get
    val n = m("n").asInstanceOf[Long]
    val h = m("h") match { case null => 0L; case x => x.asInstanceOf[Long] }
    (cut, (n, h))
  }

  /** One large-star + small-star round (Kiveris et al., SoCC'14).
    * Large-star: for each node u, connect every strictly-larger neighbor
    * to the minimum of N(u) ∪ {u}. Small-star: orient edges large→small;
    * connect every neighbor (and u itself) of each node u to the minimum
    * of its ≤-neighborhood. No trailing distinct after large-star:
    * small-star's collect_set dedupes anyway, so a distinct there would
    * only add a third shuffle per round. */
  private def starRound(e: DataFrame): DataFrame = {
    val nbrs = e.select(col("u"), col("v"))
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val largeStar = nbrs
      .groupBy("u")
      .agg(collect_set(col("v")).as("ns"))
      .select(col("u"),
        least(col("u"), array_min(col("ns"))).as("m"),
        filter(col("ns"), n => n > col("u")).as("bigger"))
      .select(explode(col("bigger")).as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
    val oriented = largeStar.select(
      greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    oriented
      .groupBy("u")
      .agg(array_min(collect_set(col("v"))).as("m"),
        collect_set(col("v")).as("ns"))
      .select(col("m"),
        filter(array_union(col("ns"), array(col("u"))),
          n => n =!= col("m")).as("others"))
      .select(explode(col("others")).as("u"), col("m").as("v"))
      .distinct()
  }

  /** Run the alternating-star loop to its fixpoint: returns the star edge
    * set (u = member, v = component-root = min id of the component).
    *
    * Two job-count fusions (the loop cost at toy/driver scale is jobs ×
    * fixed overhead; at cluster scale the same fusions remove full-edge-
    * set shuffles):
    *  - NO pre-loop cut/fingerprint of the input: round 1's `collect_set`
    *    dedupes the raw canonical edges, so the old distinct+materialize
    *    of the FULL edge set — the two most expensive jobs, every later
    *    round being star-set-sized — is fused into round 1's shuffle.
    *  - TWO rounds per lineage cut + fingerprint check, halving the job
    *    count at the price of at most one extra (idempotent) round after
    *    the fixpoint. Correct because the alternating-star potential is
    *    monotone — no 2-cycle can alias the pairwise fingerprint — and a
    *    star set is a fixpoint of BOTH rounds. Within a pair the first
    *    round's self-union ends in an exchange, which Spark's
    *    ReuseExchange deduplicates, not recomputes. */
  private def starFixpoint(e0: DataFrame, maxIterations: Int): DataFrame = {
    var e = e0
    var prevFp: (Long, Long) = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val (next, fp) = cutWithFingerprint(starRound(starRound(e)))
      // Converged when the (canonical, deduped) edge set is unchanged; an
      // empty star set (empty/self-loop-only input) is trivially fixed.
      e = next
      converged = fp == prevFp || fp._1 == 0L
      prevFp = fp
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
    // All nodes, including isolated / self-loop-only ones.
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
      .withColumn("id", xxhash64(col("node")))
      .persist()
    nodes.count() // materialize before reusing in two branches

    val e = starFixpoint(hashedEdges(edges), maxIterations)

    // At the fixpoint the edge set is a union of stars rooted at each
    // component's min id: (u=member, v=root). Nodes absent from any edge
    // are their own root.
    val roots = e.select(col("u").as("id"), col("v").as("root"))
      .unionByName(e.select(col("v").as("id"), col("v").as("root")))
      .groupBy("id").agg(min("root").as("root"))
    val out = nodes.join(roots, Seq("id"), "left")
      .select(col("node"), coalesce(col("root"), col("id")).as("component"))
    nodes.unpersist()
    out
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
                                          maxIterations: Int = 30): Long = {
    val e = starFixpoint(canonicalize(ehash), maxIterations)
    val starMembers = e.select(col("u").as("id"))
      .unionByName(e.select(col("v").as("id"))).distinct()
    val ids = ehash.select(col("u").as("id"))
      .unionByName(ehash.select(col("v").as("id")))
      .filter(col("id").isNotNull) // null endpoint = no node (Graph.stats)
      .distinct()
    // root count and singleton count in ONE action (1-row × 1-row cross
    // join of the two aggregates) instead of two separate count jobs
    val row = e.agg(countDistinct(col("v")).as("n_roots"))
      .crossJoin(ids.join(starMembers, Seq("id"), "left_anti")
        .agg(count(lit(1)).as("n_singletons")))
      .collect().head
    row.getLong(0) + row.getLong(1)
  }
}
