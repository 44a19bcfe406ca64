package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** Multi-source BFS hop distances — the reachability/proximity statistic
  * beside [[ConnectedComponents]] (membership), [[PageRank]] (centrality),
  * [[Triangles]] (clustering) and [[KCore]] (cohesion). The reference's
  * graph surface exports edges for downstream network analysis
  * (`manager/bel_manager.py` to_bel, `compath/manager.py:384-394` BEL
  * export); hop distance from a seed set ("how far is every entity from
  * the curated core?") is the standard next question that same edge
  * surface serves, and at corpus scale it must be the frontier-relaxation
  * formulation (Pregel/Pegasus-style iterated min-plus), never a
  * driver-side traversal.
  *
  * Algorithm: synchronous label relaxation to fixpoint. `dist` starts at 0
  * on the seeds; each round candidates = `dist ⋈ edges` + 1 unioned with
  * the current frame, folded by `min(hops)` per node. The frame grows only
  * while strictly-shorter paths exist, so the round count is the graph's
  * eccentricity from the seed set (small on the dense co-occurrence graphs
  * this engine builds), and iterating past the fixpoint is the identity —
  * the property the unrolled-CTE oracle relies on.
  *
  * Scale shape: each round is one equi-join on the frontier key plus one
  * hash-aggregation on node id — nothing all-pairs, no driver-side graph,
  * and the per-round frame is lineage-cut so round r+1 never replays
  * round r's plan. Relaxing the FULL dist frame each round (not a delta
  * frontier) keeps every round a 2-stage job; a delta-frontier variant
  * saves join input at high diameters but adds a third shuffle per round,
  * the wrong trade on low-diameter graphs.
  *
  * Output: `(node, hops)` for every node REACHABLE from the seed set
  * (unreachable nodes are absent, the relational mirror of +∞).
  */
object Bfs {

  /** Hop distance from `seeds` (one column, same type as the edge
    * endpoints) over the UNDIRECTED graph of `edges`. `maxDepth` bounds
    * the rounds for pathological diameters; the fixpoint usually lands
    * first. Seeds not present in `edges` still report hops = 0. */
  def hops(edges: DataFrame, seeds: DataFrame, maxDepth: Int = 20,
           srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val seedCol = seeds.columns.head
    // undirected adjacency: one row per direction, self-loops dropped
    val fwd = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val rev = edges.select(col(dstCol).as("u"), col(srcCol).as("v"))
    val adj = fwd.unionByName(rev).filter(col("u") =!= col("v"))
      .distinct().persist()
    adj.count()

    def footprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("hops"), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var dist = Checkpoints.cut(
      seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("hops", lit(0)))
    var prev = footprint(dist)
    var converged = false
    var depth = 0
    while (!converged && depth < maxDepth) {
      val relaxed = dist.join(adj, dist("node") === adj("u"))
        .select(col("v").as("node"), (col("hops") + 1).as("hops"))
      val next = Checkpoints.cut(
        dist.unionByName(relaxed)
          .groupBy("node").agg(min("hops").as("hops")))
      // fixpoint when no node gained a first-or-shorter distance: rows
      // only ever append and per-node hops only ever decrease, so the
      // (row count, hop sum) pair is a strictly-monotone progress measure
      val cur = footprint(next)
      converged = cur == prev
      prev = cur
      dist = next
      depth += 1
    }
    adj.unpersist()
    dist
  }

  /** Per-seed hop distances: `(seed, node, hops)` for every (seed,
    * reachable node) pair — [[hops]] keyed by origin instead of folded
    * to the min. Same synchronous relaxation, same strictly-monotone
    * (row count, hop sum) fixpoint measure, with the state keyed on the
    * COMPOSITE (seed, node): each round is one equi-join on the frontier
    * node plus one hash-aggregation, and the frame is bounded by
    * |seeds| × |reachable|, which is why callers hand this a LANDMARK
    * seed set, not the full vertex set (all-pairs BFS is not a 100 TB
    * plan; landmark selection is the standard approximation — Potamias
    * et al., "Fast shortest path distance estimation in large networks",
    * CIKM 2009). */
  def hopsPerSeed(edges: DataFrame, seeds: DataFrame, maxDepth: Int = 20,
                  srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val seedCol = seeds.columns.head
    val fwd = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val rev = edges.select(col(dstCol).as("u"), col(srcCol).as("v"))
    val adj = fwd.unionByName(rev).filter(col("u") =!= col("v"))
      .distinct().persist()
    adj.count()

    def footprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("hops"), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    var dist = Checkpoints.cut(
      seeds.select(col(seedCol).as("seed")).distinct()
        .select(col("seed"), col("seed").as("node"),
          lit(0).as("hops")))
    var prev = footprint(dist)
    var converged = false
    var depth = 0
    while (!converged && depth < maxDepth) {
      val relaxed = dist.join(adj, dist("node") === adj("u"))
        .select(col("seed"), col("v").as("node"),
          (col("hops") + 1).as("hops"))
      val next = Checkpoints.cut(
        dist.unionByName(relaxed)
          .groupBy("seed", "node").agg(min("hops").as("hops")))
      val cur = footprint(next)
      converged = cur == prev
      prev = cur
      dist = next
      depth += 1
    }
    adj.unpersist()
    dist
  }

  /** Landmark harmonic closeness: for every node reachable from at
    * least one landmark, `n_landmarks` = how many landmarks reach it
    * (self excluded), `hop_mass` = Σ distance, and `harmonic` =
    * Σ 1/distance (the harmonic-centrality estimator restricted to the
    * landmark sample — Boldi & Vigna, "Axioms for centrality", Internet
    * Math. 10, 2014). One aggregation over [[hopsPerSeed]]; a landmark's
    * own row (d = 0) carries no mass by definition.
    *
    * Exactness: a float Σ 1/d is accumulation-order-dependent, so it
    * would differ between engines by ulps. Instead the sum runs over
    * the EXACT integers `L div d` with `L = lcm(1..20)` (every hop
    * count ≤ 20 divides L), and `harmonic` is that one exact integer
    * divided by L once — bit-reproducible anywhere. `maxDepth` is
    * therefore capped at 20 on this face (landmark BFS past depth 20
    * adds ~zero closeness mass anyway: 1/d < 0.05). */
  def harmonicCloseness(edges: DataFrame, landmarks: DataFrame,
                        maxDepth: Int = 20, srcCol: String = "src",
                        dstCol: String = "dst"): DataFrame = {
    require(maxDepth <= 20,
      s"harmonicCloseness caps maxDepth at 20 (lcm-exact sums), got $maxDepth")
    val L = 232792560L // lcm(1..20)
    hopsPerSeed(edges, landmarks, maxDepth, srcCol, dstCol)
      .filter(col("hops") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_landmarks"),
        sum(col("hops").cast("long")).as("hop_mass"),
        (sum(expr(s"$L div hops")).cast("double") / L).as("harmonic"))
  }
}
