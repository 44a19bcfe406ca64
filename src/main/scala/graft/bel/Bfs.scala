package graft.bel

import org.apache.spark.sql.{Column, DataFrame}
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
  * Algorithm: synchronous label relaxation to fixpoint — ONE loop
  * ([[relaxLoop]]) parameterized by the state key (`node` for the folded
  * distance, `(seed, node)` for the per-seed face). `dist` starts at 0
  * on the seeds; each round candidates = `dist ⋈ edges` + 1 unioned with
  * the current frame, folded by `min(hops)` per key. The frame grows only
  * while strictly-shorter paths exist, so the round count is the graph's
  * eccentricity from the seed set (small on the dense co-occurrence graphs
  * this engine builds), and iterating past the fixpoint is the identity —
  * the property the unrolled-CTE oracle relies on.
  *
  * Scale shape: the loop runs DICT-ENCODED — endpoints and seeds hash to
  * longs (`xxhash64`) at entry and the values join back through one
  * dictionary at the rim (the [[PageRank]] encode posture, with the same
  * negligible-collision caveat; nothing in a min-plus relaxation orders
  * by id, so the hash encode suffices where [[LabelPropagation]] needs
  * order-preserving ids). Each round is then one equi-join on the 8-byte
  * frontier key plus one hash-aggregation — raw node values never
  * shuffle inside the loop — and the per-round frame is lineage-cut so
  * round r+1 never replays round r's plan. Relaxing the FULL dist frame
  * each round (not a delta frontier) keeps every round a 2-stage job; a
  * delta-frontier variant saves join input at high diameters but adds a
  * third shuffle per round, the wrong trade on low-diameter graphs.
  *
  * Output: `(node, hops)` for every node REACHABLE from the seed set
  * (unreachable nodes are absent, the relational mirror of +∞).
  */
object Bfs {

  /** The encode compares xxhash64 digests, and Spark hashes by PHYSICAL
    * type — `xxhash64(1: int) != xxhash64(1L)` — so a seed column whose
    * type differs from the edge endpoints would silently join NOTHING
    * (empty or seeds-only output) where the pre-encode code's implicit
    * join casts still matched. Fail fast with the cast instruction
    * instead. */
  private[bel] def requireSameKeyType(op: String, edges: DataFrame,
                                      srcCol: String, dstCol: String,
                                      other: DataFrame,
                                      otherCol: String,
                                      role: String): Unit = {
    val st = edges.schema(srcCol).dataType
    val dt = edges.schema(dstCol).dataType
    require(st == dt, s"$op: edge endpoint types differ ('$srcCol' is " +
      s"${st.sql}, '$dstCol' is ${dt.sql}) — cast to one type upstream " +
      "(the dict encode hashes by physical type)")
    val ot = other.schema(otherCol).dataType
    require(ot == st, s"$op: $role column '$otherCol' is ${ot.sql} but " +
      s"the edge endpoints are ${st.sql} — cast upstream (xxhash64 " +
      "hashes by physical type; a mismatch silently matches nothing)")
  }

  /** Undirected encoded adjacency: one row per direction, null
    * endpoints and self-loops dropped ON VALUES (hashing first would
    * turn nulls into joinable seeds), then hashed to `(u, v)` longs. */
  private def encodedAdj(edges: DataFrame, srcCol: String,
                         dstCol: String): DataFrame = {
    val fwd = edges.select(col(srcCol).as("nu"), col(dstCol).as("nv"))
    val rev = edges.select(col(dstCol).as("nu"), col(srcCol).as("nv"))
    fwd.unionByName(rev)
      .filter(col("nu").isNotNull && col("nv").isNotNull &&
        col("nu") =!= col("nv"))
      .select(xxhash64(col("nu")).as("u"), xxhash64(col("nv")).as("v"))
      .distinct()
  }

  /** Rim dictionary `(id, value)` over every endpoint and seed value —
    * built once, joined once after the loop (seeds absent from the
    * edges still need a decode row: they report hops = 0). */
  private def rimDict(edges: DataFrame, seeds: DataFrame, srcCol: String,
                      dstCol: String): DataFrame = {
    val seedCol = seeds.columns.head
    edges.select(col(srcCol).as("value"))
      .unionByName(edges.select(col(dstCol).as("value")))
      .unionByName(seeds.select(col(seedCol).as("value")))
      .distinct()
      .select(xxhash64(col("value")).as("id"), col("value"))
  }

  /** ONE relaxation round: frontier join on the encoded `node` key +
    * min-fold on `keyCols`. `inc` is the per-edge step — `lit(1)` for
    * hop counting, the adjacency's weight column for weighted costs
    * (min-plus is the same fold either way). Exposed for the plan pin:
    * every exchange this round plans must hash on long keys. */
  private[bel] def relaxOnce(adj: DataFrame, dist: DataFrame,
                             keyCols: Seq[String],
                             inc: Column = lit(1)): DataFrame = {
    val carried = keyCols.filterNot(_ == "node").map(col)
    val relaxed = dist.join(adj, dist("node") === adj("u"))
      .select(carried ++ Seq(col("v").as("node"),
        (col("hops") + inc).as("hops")): _*)
    dist.unionByName(relaxed)
      .groupBy(keyCols.map(col): _*).agg(min("hops").as("hops"))
  }

  /** Synchronous min-plus relaxation to fixpoint over the encoded
    * graph. `dist0` carries `keyCols` + `hops`; fixpoint when no key
    * gained a first-or-shorter distance — rows only ever append and
    * per-key hops only ever decrease, so the (row count, hop sum) pair
    * is a strictly-monotone progress measure. */
  private def relaxLoop(adj: DataFrame, dist0: DataFrame,
                        keyCols: Seq[String], maxDepth: Int,
                        inc: Column = lit(1)): DataFrame = {
    def footprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("hops"), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    // LAZY cuts materialized by the footprint aggregate — one job per
    // relax round instead of cut-then-measure two (the Scc
    // minLabelFixpoint discipline: the footprint is the round's FIRST
    // action and a lone single-branch full scan, so it caches every
    // block it reads; the next round's two-branch read hits cache)
    var dist = Checkpoints.cutLazy(dist0)
    var prev = footprint(dist)
    var converged = false
    var depth = 0
    while (!converged && depth < maxDepth) {
      val next = Checkpoints.cutLazy(relaxOnce(adj, dist, keyCols, inc))
      val cur = footprint(next)
      converged = cur == prev
      prev = cur
      dist = next
      depth += 1
    }
    dist
  }

  /** Weighted shortest-path COSTS from `seeds` — [[hops]] with a
    * min-plus step of the edge weight instead of 1: `(node, cost)` for
    * every node reachable within `maxHops` EDGES, cost = the exact
    * minimum sum of weights over such paths (once the relaxation
    * fixpoint lands inside the bound, that IS the shortest-path
    * distance; with positive weights every shortest path uses fewer
    * edges than the node count, so a bound past the hop eccentricity
    * is exact). Weights must be POSITIVE and INTEGRAL — positivity
    * keeps min-plus monotone (a ≤ 0 weight would cycle), integrality
    * keeps every cost an exact BIGINT sum (the [[harmonicCloseness]]
    * exactness posture: quantize weights upstream, divide at the rim).
    * Parallel edges keep their MINIMUM weight (only the cheapest copy
    * can sit on a shortest path). Same encoded loop, same per-round
    * shape, weight riding the adjacency. */
  /** Undirected encoded WEIGHTED adjacency `(u, v, w)` shared by
    * [[weightedHops]] and [[weightedBetweenness]]: both directions,
    * null/loop rows dropped on values, endpoints hashed, parallel
    * copies min-folded (only the cheapest copy can sit on a shortest
    * path). Weights must be POSITIVE and INTEGRAL — validated on the
    * PRE-fold rows (min(w) would silently skip a null parallel copy)
    * as a narrow scan; the min-fold then runs exactly once,
    * materialized by the cut. */
  private def encodedWeightedAdj(op: String, edges: DataFrame,
                                 weightCol: String, srcCol: String,
                                 dstCol: String): DataFrame = {
    require(Seq("BIGINT", "INT", "SMALLINT", "TINYINT")
      .contains(edges.schema(weightCol).dataType.sql),
      s"$op needs an INTEGRAL weight column (quantize first " +
        s"— cents/micros); '$weightCol' is " +
        edges.schema(weightCol).dataType.sql)
    val fwd = edges.select(col(srcCol).as("nu"), col(dstCol).as("nv"),
      col(weightCol).cast("long").as("w"))
    val rev = edges.select(col(dstCol).as("nu"), col(srcCol).as("nv"),
      col(weightCol).cast("long").as("w"))
    val raw = fwd.unionByName(rev)
      .filter(col("nu").isNotNull && col("nv").isNotNull &&
        col("nu") =!= col("nv"))
      .select(xxhash64(col("nu")).as("u"), xxhash64(col("nv")).as("v"),
        col("w"))
    val bad = raw.filter(col("w").isNull || col("w") <= 0L).count()
    require(bad == 0L, s"$op: $bad edge cop(y/ies) with " +
      "non-positive or null weight — min-plus needs strictly positive " +
      "weights")
    Checkpoints.cut(raw.groupBy("u", "v").agg(min("w").as("w")))
  }

  def weightedHops(edges: DataFrame, seeds: DataFrame, weightCol: String,
                   maxHops: Int = 20, srcCol: String = "src",
                   dstCol: String = "dst"): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val seedCol = seeds.columns.head
    requireSameKeyType("weightedHops", edges, srcCol, dstCol, seeds,
      seedCol, "seed")
    val adj = encodedWeightedAdj("weightedHops", edges, weightCol,
      srcCol, dstCol)
    val dist0 = seeds.select(col(seedCol).as("nv")).distinct()
      .select(xxhash64(col("nv")).as("node"), lit(0L).as("hops"))
    val dist = relaxLoop(adj, dist0, Seq("node"), maxHops, col("w"))
    dist.join(rimDict(edges, seeds, srcCol, dstCol)
        .withColumnRenamed("id", "node"), Seq("node"))
      .select(col("value").as("node"), col("hops").as("cost"))
  }

  /** Hop distance from `seeds` (one column, same type as the edge
    * endpoints) over the UNDIRECTED graph of `edges`. `maxDepth` bounds
    * the rounds for pathological diameters; the fixpoint usually lands
    * first. Seeds not present in `edges` still report hops = 0. */
  def hops(edges: DataFrame, seeds: DataFrame, maxDepth: Int = 20,
           srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val seedCol = seeds.columns.head
    requireSameKeyType("hops", edges, srcCol, dstCol, seeds,
      seedCol, "seed")
    val adj = Checkpoints.cut(encodedAdj(edges, srcCol, dstCol))
    val dist0 = seeds.select(col(seedCol).as("nv")).distinct()
      .select(xxhash64(col("nv")).as("node"), lit(0).as("hops"))
    val dist = relaxLoop(adj, dist0, Seq("node"), maxDepth)
    dist.join(rimDict(edges, seeds, srcCol, dstCol)
        .withColumnRenamed("id", "node"), Seq("node"))
      .select(col("value").as("node"), col("hops"))
  }

  /** Per-seed hop distances: `(seed, node, hops)` for every (seed,
    * reachable node) pair — [[hops]] keyed by origin instead of folded
    * to the min. Same loop, state keyed on the COMPOSITE (seed, node):
    * the frame is bounded by |seeds| × |reachable|, which is why callers
    * hand this a LANDMARK seed set, not the full vertex set (all-pairs
    * BFS is not a 100 TB plan; landmark selection is the standard
    * approximation — Potamias et al., "Fast shortest path distance
    * estimation in large networks", CIKM 2009). */
  def hopsPerSeed(edges: DataFrame, seeds: DataFrame, maxDepth: Int = 20,
                  srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    val dict = rimDict(edges, seeds, srcCol, dstCol)
    hopsPerSeedEncoded(edges, seeds, maxDepth, srcCol, dstCol)
      .join(dict.select(col("id").as("seed"), col("value").as("__s")),
        Seq("seed"))
      .join(dict.select(col("id").as("node"), col("value").as("__n")),
        Seq("node"))
      .select(col("__s").as("seed"), col("__n").as("node"), col("hops"))
  }

  /** The ENCODED per-seed distances `(seed, node, hops)` as long ids —
    * shared by [[hopsPerSeed]] (which decodes both keys) and
    * [[harmonicCloseness]] (which aggregates FIRST and decodes the
    * one surviving key after the fold). */
  private def hopsPerSeedEncoded(edges: DataFrame, seeds: DataFrame,
                                 maxDepth: Int, srcCol: String,
                                 dstCol: String): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val seedCol = seeds.columns.head
    requireSameKeyType("hopsPerSeedEncoded", edges, srcCol, dstCol, seeds,
      seedCol, "seed")
    val adj = Checkpoints.cut(encodedAdj(edges, srcCol, dstCol))
    val dist0 = seeds.select(col(seedCol).as("nv")).distinct()
      .select(xxhash64(col("nv")).as("seed"))
      .select(col("seed"), col("seed").as("node"), lit(0).as("hops"))
    relaxLoop(adj, dist0, Seq("seed", "node"), maxDepth)
  }

  /** Shortest-path COUNTS from landmark seeds — the σ stage of Brandes'
    * betweenness (Brandes, "A faster algorithm for betweenness
    * centrality", J. Math. Sociol. 2001), bounded-depth and
    * landmark-sampled (the [[hopsPerSeed]] scale posture — never
    * all-pairs): per (seed, reachable node), the hop distance and the
    * EXACT number of distinct shortest paths, `(seed, node, hops,
    * sigma)`. σ is the standard path-redundancy signal ("how many ways
    * does the curated core reach this entity") and the input Brandes'
    * backward pass consumes.
    *
    * Unlike [[hops]]' full-frame min-relaxation, σ REQUIRES the
    * level-synchronous delta-frontier form: a node's count must sum
    * contributions ONLY from neighbors one level nearer the seed, so
    * each round expands exactly the previous level's frontier and
    * anti-joins the visited set — σ(v, d+1) = Σ σ(u, d) over frontier
    * neighbors, new nodes only. Three long-keyed exchanges per level
    * (frontier join, (seed, node) fold, visited anti-join), encoded
    * ids throughout, values decoded at the rim.
    *
    * `maxDepth` defaults LOW (4): σ grows multiplicatively with depth
    * (branching^d) and a BIGINT overflow past 2⁶³ would WRAP silently
    * under non-ANSI arithmetic while an exact oracle errors — the
    * k-bounded form is the standard betweenness approximation anyway
    * (k-betweenness). The cap is enforced, not advisory. */
  def pathCounts(edges: DataFrame, seeds: DataFrame, maxDepth: Int = 4,
                 srcCol: String = "src", dstCol: String = "dst")
      : DataFrame = {
    val (_, visited) =
      pathCountsEncoded(edges, seeds, maxDepth, srcCol, dstCol)
    val dict = rimDict(edges, seeds, srcCol, dstCol)
    visited
      .join(dict.select(col("id").as("seed"), col("value").as("__s")),
        Seq("seed"))
      .join(dict.select(col("id").as("node"), col("value").as("__n")),
        Seq("node"))
      .select(col("__s").as("seed"), col("__n").as("node"), col("hops"),
        col("sigma"))
  }

  /** The ENCODED forward phase shared by [[pathCounts]] and
    * [[landmarkBetweenness]]: returns the encoded adjacency and the
    * visited frame `(seed, node, hops, sigma)` as long ids. */
  private def pathCountsEncoded(edges: DataFrame, seeds: DataFrame,
                                maxDepth: Int, srcCol: String,
                                dstCol: String)
      : (DataFrame, DataFrame) = {
    require(maxDepth >= 0 && maxDepth <= 12,
      s"pathCounts caps maxDepth at 12 (σ grows as branching^depth " +
        s"and must stay inside BIGINT), got $maxDepth")
    val seedCol = seeds.columns.head
    requireSameKeyType("pathCountsEncoded", edges, srcCol, dstCol, seeds,
      seedCol, "seed")
    val adj = Checkpoints.cut(encodedAdj(edges, srcCol, dstCol))
    var visited = Checkpoints.cut(
      seeds.select(col(seedCol).as("nv")).distinct()
        .select(xxhash64(col("nv")).as("seed"))
        .select(col("seed"), col("seed").as("node"),
          lit(0).as("hops"), lit(1L).as("sigma")))
    var frontier = visited
    var depth = 0
    var exhausted = false
    // ONE job per BFS round (r14, the relaxLoop discipline): the frontier
    // cut is LAZY and the emptiness probe is a count() — the round's first
    // action and a lone single-branch scan, so it materializes the new
    // frontier's blocks (and, through the anti-join it reads, the previous
    // round's lazy visited union). The visited union is lazy too: its
    // first reader is the NEXT round's count job (single branch; the
    // union's own re-read of it comes later, off cached blocks). The
    // eager-cut epilogue below covers the multi-branch readers
    // (landmarkBetweenness fans visited into va/vb/δ-levels).
    while (!exhausted && depth < maxDepth) {
      val contrib = frontier.join(adj, frontier("node") === adj("u"))
        .groupBy(col("seed"), col("v").as("node"))
        .agg(sum("sigma").as("sigma"))
      val nxt = Checkpoints.cutLazy(contrib
        .join(visited.select(col("seed"), col("node")),
          Seq("seed", "node"), "left_anti")
        .select(col("seed"), col("node"),
          lit(depth + 1).as("hops"), col("sigma")))
      if (nxt.count() == 0L) exhausted = true
      else {
        visited = Checkpoints.cutLazy(visited.unionByName(nxt))
        frontier = nxt
        depth += 1
      }
    }
    // One eager sweep of the (cheap, block-concatenating) union chain so
    // callers can fan out over the result without the concurrent-first-
    // read hazard. When the loop ended by exhaustion the chain is already
    // cached and this job is a copy of cached blocks only.
    (adj, Checkpoints.cut(visited))
  }

  /** Landmark (source-sampled, depth-bounded) BETWEENNESS centrality —
    * the full Brandes dependency accumulation over the [[pathCounts]]
    * forward state (Brandes 2001): for each landmark s, the backward
    * pass folds δ_s(v) = Σ_{w ∈ succ(v)} σ(v)/σ(w) · (1 + δ_s(w)) down
    * the shortest-path DAG level by level, and the estimate is
    * Σ_s δ_s(v) over the sampled sources (the standard
    * pivot-sampling estimator — Brandes & Pich 2007; exact betweenness
    * is all-pairs and not a 100 TB plan). Depth-bounding truncates
    * both passes consistently (k-betweenness semantics).
    *
    * Scale shape: the shortest-path DAG is ONE three-way equi-join of
    * the visited frame with the adjacency (successor = neighbor one
    * level deeper, same seed), then `maxDepth − 1` backward rounds of
    * one join + one (seed, node)-keyed fold each — every exchange on
    * encoded longs, values decoded once at the rim. δ is a double
    * (the σ-ratio is inherently fractional); each δ is ONE
    * aggregation's sum, the [[PageRank]] float posture.
    *
    * Output: `(node, betweenness)` for every node reached at ≥ 1 hop
    * by at least one landmark. A source's own row (v = s, level 0) is
    * excluded per Brandes — but a landmark reached by OTHER landmarks
    * still accumulates like any node. Unreached nodes are absent. */
  def landmarkBetweenness(edges: DataFrame, seeds: DataFrame,
                          maxDepth: Int = 4, srcCol: String = "src",
                          dstCol: String = "dst"): DataFrame = {
    val (adj, visited) =
      pathCountsEncoded(edges, seeds, maxDepth, srcCol, dstCol)
    // shortest-path DAG edges: v → w with hops(w) = hops(v) + 1, per
    // seed; carries the σ-ratio the backward fold multiplies
    val va = visited.select(col("seed"), col("node").as("v"),
      col("hops").as("hv"), col("sigma").as("sv"))
    val vb = visited.select(col("seed").as("sb"), col("node").as("w"),
      col("hops").as("hw"), col("sigma").as("sw"))
    val adjR = adj.select(col("u").as("au"), col("v").as("aw"))
    val dag = Checkpoints.cut(va
      .join(adjR, col("v") === col("au"))
      .join(vb, col("sb") === col("seed") && col("w") === col("aw") &&
        col("hw") === col("hv") + 1)
      .select(col("seed"), col("v"), col("w"), col("hv"),
        (col("sv").cast("double") / col("sw").cast("double"))
          .as("ratio")))
    // backward accumulation, deepest level first; level maxDepth has no
    // successors within the bound (δ = 0) but its nodes were reached,
    // so they enter the output with zero contribution. Level 0 (v = s)
    // is excluded per Brandes — a source's own row never accumulates.
    var deltaNext = visited.filter(col("hops") === maxDepth)
      .select(col("seed"), col("node"), lit(0.0).as("delta"))
    var acc: DataFrame =
      if (maxDepth >= 1) deltaNext
      else visited.limit(0)
        .select(col("seed"), col("node"), lit(0.0).as("delta"))
    for (dLev <- (maxDepth - 1) to 1 by -1) {
      val contrib = dag.filter(col("hv") === dLev)
        .join(deltaNext.select(col("seed"), col("node").as("w"),
          col("delta")), Seq("seed", "w"))
        .groupBy(col("seed"), col("v").as("node"))
        .agg(sum(col("ratio") * (lit(1.0) + col("delta"))).as("delta"))
      val level = Checkpoints.cut(
        visited.filter(col("hops") === dLev)
          .select(col("seed"), col("node"))
          .join(contrib, Seq("seed", "node"), "left")
          .select(col("seed"), col("node"),
            coalesce(col("delta"), lit(0.0)).as("delta")))
      acc = acc.unionByName(level)
      deltaNext = level
    }
    val folded = acc
      .groupBy("node").agg(sum("delta").as("betweenness"))
    folded
      .join(rimDict(edges, seeds, srcCol, dstCol)
        .withColumnRenamed("id", "node"), Seq("node"))
      .select(col("value").as("node"), col("betweenness"))
  }

  /** Landmark harmonic closeness: for every node reachable from at
    * least one landmark, `n_landmarks` = how many landmarks reach it
    * (self excluded), `hop_mass` = Σ distance, and `harmonic` =
    * Σ 1/distance (the harmonic-centrality estimator restricted to the
    * landmark sample — Boldi & Vigna, "Axioms for centrality", Internet
    * Math. 10, 2014). One aggregation over the encoded per-seed
    * distances — the fold runs on 8-byte node ids and the values decode
    * AFTER it, so the aggregation exchange never carries node values;
    * a landmark's own row (d = 0) carries no mass by definition.
    *
    * Exactness: a float Σ 1/d is accumulation-order-dependent, so it
    * would differ between engines by ulps. Instead the sum runs over
    * the EXACT integers `L div d` with `L = lcm(1..20)` (every hop
    * count ≤ 20 divides L), and `harmonic` is that one exact integer
    * divided by L once — bit-reproducible anywhere. `maxDepth` is
    * therefore capped at 20 on this face (landmark BFS past depth 20
    * adds ~zero closeness mass anyway: 1/d < 0.05). */
  /** WEIGHTED landmark betweenness — Brandes' σ and dependency folds
    * over the min-plus (equal-cost) shortest-path DAG instead of the
    * hop-level DAG (Brandes 2001 §4's weighted form, landmark-sampled
    * and round-bounded like [[landmarkBetweenness]]). Closes the gap
    * the unweighted face documents: with integral positive weights,
    * "one level deeper" is no longer "one hop deeper", so the DAG keys
    * on COST — predecessor v of w iff `cost(w) = cost(v) + w(v,w)` —
    * and the folds iterate to their DAG fixpoints rather than walking
    * hop levels.
    *
    * Three bounded loops, each `rounds` iterations, each round one
    * long-keyed equi-join + one (seed, node) fold (the [[Bfs]] loop
    * discipline; every exchange hashes 8-byte keys):
    *
    *  1. COSTS: per-seed min-plus relaxation ([[relaxLoop]] with the
    *     weight step — the a37 recurrence, keyed (seed, node)).
    *  2. σ: `σ_t(v) = Σ_{u ∈ pred_DAG(v)} σ_{t−1}(u)`, σ(seed) = 1 —
    *     RECOMPUTE-from-predecessors, not accumulate: once every
    *     predecessor of v is final, v is final, so t ≥ the DAG's
    *     longest-path length fixes every σ exactly (the DAG is acyclic
    *     because positive weights make cost strictly increase along
    *     it; a seed has no DAG in-edges for the same reason, so the
    *     seed row unions in disjointly). EXACT BIGINT counts.
    *  3. δ: `δ_t(v) = Σ_{w ∈ succ_DAG(v)} σ(v)/σ(w) · (1 + δ_{t−1}(w))`
    *     from δ_0 ≡ 0 — the mirror-image recompute; t ≥ the backward
    *     DAG depth fixes it. Double sums (σ-ratios are fractional) —
    *     the [[landmarkBetweenness]] float posture.
    *
    * Bounded-round contract (the a37/a38 discipline): the gate's
    * unrolled-CTE oracle runs EXACTLY these recurrences for the same
    * `rounds`, so the result is engine-identical whether or not the
    * fixpoints land inside the bound; semantically, any `rounds` past
    * the weighted eccentricity (in DAG edges) is exact. `rounds` caps
    * at 12 — σ grows multiplicatively and must stay inside BIGINT
    * ([[pathCounts]]' enforced cap).
    *
    * Output: `(node, betweenness)` — Σ over landmarks of δ, landmark
    * self-rows excluded per Brandes; unreached nodes absent. */
  def weightedBetweenness(edges: DataFrame, seeds: DataFrame,
                          weightCol: String, rounds: Int = 6,
                          srcCol: String = "src",
                          dstCol: String = "dst"): DataFrame = {
    require(rounds >= 1 && rounds <= 12,
      s"weightedBetweenness caps rounds at 12 (σ grows as " +
        s"branching^rounds and must stay inside BIGINT), got $rounds")
    val seedCol = seeds.columns.head
    requireSameKeyType("weightedBetweenness", edges, srcCol, dstCol,
      seeds, seedCol, "seed")
    val adj = encodedWeightedAdj("weightedBetweenness", edges, weightCol,
      srcCol, dstCol)
    // 1. per-seed exact costs (bounded min-plus relaxation)
    val dist0 = seeds.select(col(seedCol).as("nv")).distinct()
      .select(xxhash64(col("nv")).as("seed"))
      .select(col("seed"), col("seed").as("node"), lit(0L).as("hops"))
    // relaxLoop already returns a lineage-cut frame whose blocks its own
    // footprint aggregate materialized — re-wrapping in an eager cut paid
    // one full copy job for blocks that were already cached (r14).
    val cost = relaxLoop(adj, dist0, Seq("seed", "node"), rounds, col("w"))
    // equal-cost predecessor DAG: v → w within a seed iff stepping the
    // edge preserves shortest-path optimality — ONE 3-way equi-join
    // keyed on cost instead of level
    val ca = cost.select(col("seed"), col("node").as("v"),
      col("hops").as("cv"))
    val cb = cost.select(col("seed").as("sb"), col("node").as("w"),
      col("hops").as("cw"))
    val dag = Checkpoints.cut(ca
      .join(adj.select(col("u"), col("v").as("av"), col("w").as("ew")),
        col("v") === col("u"))
      .join(cb, col("sb") === col("seed") && col("w") === col("av") &&
        col("cw") === col("cv") + col("ew"))
      .select(col("seed"), col("v"), col("w")))
    // 2. σ fixpoint (recompute-from-predecessors). Each round's frame is
    // read EXACTLY once (by the next round's join), so the cuts are LAZY
    // and the whole chain materializes in the final round's one eager job
    // — 1 job for the fixpoint instead of `rounds` (r14; the relaxLoop
    // one-job-per-round discipline taken to its no-progress-check limit).
    // The LAST round stays eager: the rdag build below reads it through
    // TWO branches (sv, sw) — the documented cutLazy concurrent-first-read
    // hazard.
    val sig0 = dist0.select(col("seed"), col("node"), lit(1L).as("sigma"))
    var sig = sig0
    for (r <- 1 to rounds) {
      val prop = dag.as("g")
        .join(sig.as("s"), col("g.seed") === col("s.seed") &&
          col("g.v") === col("s.node"))
        .groupBy(col("g.seed").as("seed"), col("g.w").as("node"))
        .agg(sum("sigma").as("sigma"))
      val next = sig0.unionByName(prop)
      sig = if (r == rounds) Checkpoints.cut(next)
            else Checkpoints.cutLazy(next)
    }
    // ratio-bearing DAG: σ(v)/σ(w) rides each DAG edge
    val sv = sig.select(col("seed"), col("node").as("v"),
      col("sigma").as("sv"))
    val sw = sig.select(col("seed").as("s2"), col("node").as("w"),
      col("sigma").as("sw"))
    val rdag = Checkpoints.cut(dag
      .join(sv, Seq("seed", "v"))
      .join(sw, col("s2") === col("seed") && sw("w") === dag("w"))
      .select(col("seed"), col("v"), dag("w").as("w"),
        (col("sv").cast("double") / col("sw").cast("double"))
          .as("ratio")))
    // 3. δ fixpoint (recompute-from-successors), landmark rows carried
    // so reached-but-zero nodes stay in the output
    val reached = cost.select(col("seed"), col("node"))
    var del = reached.select(col("seed"), col("node"),
      lit(0.0).as("delta"))
    // δ rounds 1..n−1 are read exactly once each — by the next round's
    // join — so those cuts are lazy and the fixpoint rides one job chain
    // (r14). The LAST round mirrors the σ loop and stays EAGER (r15,
    // ADVICE): the returned frame's first action is the CALLER's, and a
    // caller that fans it into multiple branches in one job would hit
    // the documented cutLazy concurrent-first-read hazard and recompute
    // the whole delta fixpoint once per branch.
    for (r <- 1 to rounds) {
      val contrib = rdag.as("g")
        .join(del.as("p"), col("g.seed") === col("p.seed") &&
          col("g.w") === col("p.node"))
        .groupBy(col("g.seed").as("seed"), col("g.v").as("node"))
        .agg(sum(col("ratio") * (lit(1.0) + col("delta"))).as("delta"))
      val next = reached
        .join(contrib, Seq("seed", "node"), "left")
        .select(col("seed"), col("node"),
          coalesce(col("delta"), lit(0.0)).as("delta"))
      del = if (r == rounds) Checkpoints.cut(next)
            else Checkpoints.cutLazy(next)
    }
    del.filter(col("node") =!= col("seed"))
      .groupBy("node").agg(sum("delta").as("betweenness"))
      .join(rimDict(edges, seeds, srcCol, dstCol)
        .withColumnRenamed("id", "node"), Seq("node"))
      .select(col("value").as("node"), col("betweenness"))
  }

  def harmonicCloseness(edges: DataFrame, landmarks: DataFrame,
                        maxDepth: Int = 20, srcCol: String = "src",
                        dstCol: String = "dst"): DataFrame = {
    require(maxDepth <= 20,
      s"harmonicCloseness caps maxDepth at 20 (lcm-exact sums), got $maxDepth")
    val L = 232792560L // lcm(1..20)
    hopsPerSeedEncoded(edges, landmarks, maxDepth, srcCol, dstCol)
      .filter(col("hops") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_landmarks"),
        sum(col("hops").cast("long")).as("hop_mass"),
        (sum(expr(s"$L div hops")).cast("double") / L).as("harmonic"))
      .join(rimDict(edges, landmarks, srcCol, dstCol)
        .withColumnRenamed("id", "node"), Seq("node"))
      .select(col("value").as("node"), col("n_landmarks"),
        col("hop_mass"), col("harmonic"))
  }
}
