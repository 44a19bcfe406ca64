package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** Strongly connected components — the DIRECTED twin of
  * [[ConnectedComponents]]: maximal node sets where every pair is
  * MUTUALLY reachable along edge direction. The reachability statistic
  * citation/web/dependency graphs need where the undirected star loop
  * would over-merge (A→B alone must NOT put A and B together). Same
  * graph surface as the reference's edge exports
  * (`manager/bel_manager.py` to_bel); directed BEL relations
  * (increases/decreases) make the directed face the semantically honest
  * one for regulatory-cycle detection.
  *
  * Algorithm: iterative min-label FORWARD-BACKWARD peeling (the
  * data-parallel FW-BW/coloring family — Orzan 2004; McLendon et al.,
  * "Finding strongly connected components in distributed graphs", JPDC
  * 65(8), 2005 — in its min-label Pregel form). Each outer round, over
  * the REMAINING subgraph:
  *
  *   F(v) = min label u with a directed path u ⇝ v  (forward min)
  *   B(v) = min label u with a directed path v ⇝ u  (backward min —
  *          the same propagation over reversed edges)
  *
  * Every v with `F(v) = B(v) = c` satisfies c ⇝ v and v ⇝ c, so v is in
  * SCC(c) — and conversely every member of SCC(c) for such a c agrees,
  * so the matched set is a UNION OF WHOLE SCCs (assign, remove, repeat).
  * The SCC of the remaining subgraph's minimum label always peels (its
  * members' F and B both fold to that minimum), so the outer loop
  * strictly shrinks and terminates in at most condensation-many rounds
  * (far fewer in practice: every locally-minimal SCC peels per round).
  *
  * Each outer round first runs the TRIM step (Slota, Rajamanickam &
  * Madduri, "BFS and coloring-based parallel algorithms for strongly
  * connected components", IPDPS 2014): a node with no in-edge or no
  * out-edge in the remaining subgraph cannot lie on a directed cycle,
  * so it is its own singleton SCC — peel it in bulk, which may expose
  * more; iterate to fixpoint. Production digraphs (web, citation,
  * dependency) are tendril-heavy, and trim collapses the whole acyclic
  * fringe for two semi-joins per round WITHOUT the min-label fixpoints —
  * crucially including structures FW-BW handles badly: a deep singleton
  * chain needs diameter-many one-hop propagation rounds (it would
  * exhaust `maxInner`), while trim dissolves it in depth/2 cheap rounds
  * before FW-BW ever runs. Trim rounds do not count against `maxOuter`
  * (each is one edge-set pass; the FW-BW rounds they replace are many
  * fixpoint iterations each); `maxTrim` caps them defensively, and a
  * capped trim is safe — whatever remains just falls through to FW-BW.
  *
  * Scale shape ([[Bfs]]/[[PageRank]] loop discipline): endpoints hash to
  * longs at entry and every in-loop exchange — the two min-propagation
  * fixpoint joins/folds, the subgraph semi-joins, the F=B match, the
  * trim degree semi-joins — hashes on 8-byte keys; values decode ONCE
  * at the rim (negligible-collision caveat as everywhere; nothing
  * orders by id, so the hash encode suffices). Inner fixpoint detection
  * compares exact decimal(38,0) label sums (labels are hashes spanning
  * the full long range — a BIGINT sum would wrap and could in principle
  * alias a change; the decimal sum cannot). Per-round frames are
  * lineage-cut. Trim work scales with the acyclic fringe's DEPTH (one
  * materialized edge pass per peeled layer), not its size — bushy
  * tendrils cost a couple of rounds; the first step doubles as the
  * detector, so a trim-free round wastes exactly one pass.
  *
  * Output: `(node, component)` for every node incident to a non-loop
  * edge — `component` is an internal long label shared exactly by the
  * node's SCC (canonicalize to `min(node)` per group for a stable
  * value, the a13 discipline). Singleton SCCs (nodes on no directed
  * cycle) keep their own label.
  */
object Scc {

  def run(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
          maxOuter: Int = 50, maxInner: Int = 100,
          maxTrim: Int = 10000): DataFrame = {
    require(maxOuter >= 1 && maxInner >= 1,
      s"round caps must be positive, got maxOuter=$maxOuter maxInner=$maxInner")
    require(maxTrim >= 0, s"maxTrim must be non-negative, got $maxTrim")
    val st = edges.schema(srcCol).dataType
    val dt = edges.schema(dstCol).dataType
    require(st == dt, s"scc: edge endpoint types differ ('$srcCol' is " +
      s"${st.sql}, '$dstCol' is ${dt.sql}) — cast to one type upstream " +
      "(the dict encode hashes by physical type)")
    // DIRECTED encoded adjacency: direction is the semantics here, so
    // unlike the undirected loops there is no symmetrization
    val adj0 = Checkpoints.cut(edges
      .select(col(srcCol).as("nu"), col(dstCol).as("nv"))
      .filter(col("nu").isNotNull && col("nv").isNotNull &&
        col("nu") =!= col("nv"))
      .select(xxhash64(col("nu")).as("u"), xxhash64(col("nv")).as("v"))
      .distinct()).persist()
    val dict = edges.select(col(srcCol).as("value"))
      .unionByName(edges.select(col(dstCol).as("value")))
      .filter(col("value").isNotNull)
      .distinct()
      .select(xxhash64(col("value")).as("id"), col("value"))
    var adj = adj0
    var nodes = Checkpoints.cut(
      adj.select(col("u").as("node"))
        .unionByName(adj.select(col("v").as("node")))
        .distinct()).persist()
    var remaining = nodes.count()
    var acc: Option[DataFrame] = None
    var outer = 0
    while (remaining > 0 && outer < maxOuter) {
      // ---- Trim: bulk-peel the acyclic fringe (zero in/out degree,
      // iterated — every trimmed node is provably its own singleton
      // SCC; rationale + cost model in the object doc) ----
      val tAdj = trimFixpoint(adj, maxTrim)
      if (!(tAdj eq adj)) {
        val tNodes = Checkpoints.cut(
          tAdj.select(col("u").as("node"))
            .unionByName(tAdj.select(col("v").as("node")))
            .distinct()).persist()
        val trimmed = nodes.join(tNodes, Seq("node"), "left_anti")
          .select(col("node"), col("node").as("component"))
        val withTrim = Checkpoints.cut(
          acc.map(_.unionByName(trimmed)).getOrElse(trimmed)).persist()
        withTrim.count()
        acc.foreach(_.unpersist())
        acc = Some(withTrim)
        nodes.unpersist(); adj.unpersist()
        nodes = tNodes
        adj = tAdj
        remaining = nodes.count()
      }
      if (remaining > 0) {
        // F and B are INDEPENDENT fixpoint job chains over the same
        // persisted subgraph — submit them from two driver threads so
        // each chain's scheduling/fixpoint-probe gaps back-fill with the
        // other's tasks (the overlap-independent-jobs discipline; Spark's
        // scheduler runs concurrent jobs FIFO, which is exactly the
        // fill-the-tail behavior wanted). Results are unchanged: each
        // fixpoint is a deterministic function of (adj, nodes).
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val fwdF = Future(minLabelFixpoint(adj, nodes, maxInner)
          .withColumnRenamed("lab", "f"))
        val bwdF = Future(minLabelFixpoint(
          adj.select(col("v").as("u"), col("u").as("v")), nodes, maxInner)
          .withColumnRenamed("lab", "b"))
        val fwd = Await.result(fwdF, Duration.Inf)
        val bwd = Await.result(bwdF, Duration.Inf)
        val done = Checkpoints.cut(
          fwd.join(bwd, Seq("node"))
            .filter(col("f") === col("b"))
            .select(col("node"), col("f").as("component"))).persist()
        val labeled = Checkpoints.cut(
          acc.map(_.unionByName(done)).getOrElse(done)).persist()
        labeled.count()
        acc.foreach(_.unpersist())
        acc = Some(labeled)
        val nextNodes = Checkpoints.cut(
          nodes.join(done.select("node"), Seq("node"), "left_anti")).persist()
        val nextAdj = Checkpoints.cut(adj
          .join(nextNodes.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(nextNodes.select(col("node").as("v")), Seq("v"), "left_semi"))
          .persist()
        remaining = nextNodes.count()
        nodes.unpersist(); adj.unpersist(); done.unpersist()
        nodes = nextNodes
        adj = nextAdj
      }
      outer += 1
    }
    require(remaining == 0,
      s"scc: $remaining nodes unassigned after $maxOuter outer rounds — " +
        "raise maxOuter (peeling is monotone; more rounds always finish)")
    val out = acc match {
      case None => // edgeless input
        dict.limit(0).select(col("value").as("node"),
          col("id").as("component"))
      case Some(a) =>
        Checkpoints.cut(a
          .join(dict.withColumnRenamed("id", "node"), Seq("node"))
          .select(col("value").as("node"), col("component")))
    }
    nodes.unpersist(); adj.unpersist(); adj0.unpersist()
    acc.foreach(_.unpersist())
    out
  }

  /** Condensation — the quotient DAG over [[run]]'s components: one
    * edge `(c_src, c_dst)` per pair of DISTINCT components connected by
    * at least one original edge. Acyclic by construction (a cycle
    * between components would merge them into one SCC), which is the
    * point: it is the cycle-free dependency order build/citation/
    * import pipelines schedule on. Two rim-level decode joins + one
    * distinct on top of the component labels — the heavy lifting is
    * [[run]]'s. Callers that already hold (possibly re-labeled)
    * component labels pass them via `labels` (a `(node, component)`
    * frame) so the peel never runs twice; label values flow through
    * verbatim. Output: `(c_src, c_dst)`, distinct. */
  def condensation(edges: DataFrame, srcCol: String = "src",
                   dstCol: String = "dst", maxOuter: Int = 50,
                   maxInner: Int = 100,
                   labels: Option[DataFrame] = None): DataFrame = {
    val lab = labels.getOrElse(run(edges, srcCol, dstCol, maxOuter,
      maxInner))
    edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .join(lab.select(col("node").as(srcCol),
        col("component").as("c_src")), srcCol)
      .join(lab.select(col("node").as(dstCol),
        col("component").as("c_dst")), dstCol)
      .filter(col("c_src") =!= col("c_dst"))
      .select("c_src", "c_dst")
      .distinct()
  }

  /** Longest-path topological LEVELS over a DAG — the scheduling
    * consumer of [[condensation]]: `level(v)` = the length of the
    * longest directed path ending at v (sources sit at 0), so
    * everything at level L depends only on levels < L and a build/
    * ingest/citation pipeline can run each level as one parallel wave
    * with exactly `depth` barriers. On a DAG the longest path ending
    * anywhere extends backward to a zero-in-degree source, so
    * initializing every node at 0 and relaxing
    * `level(v) = max(level(v), max over u→v of level(u) + 1)` to
    * fixpoint computes it without identifying sources first.
    *
    * Scale shape: the [[run]] loop discipline — endpoints dict-encode
    * to 8-byte keys, each round is one equi-join + one max-fold,
    * lineage-cut; rounds = DAG depth. Fixpoint via the exact BIGINT
    * level sum (monotone non-decreasing, fixed row count; bounded by
    * n·depth ≪ 2⁶³, so no wrap). A CYCLE makes the relaxation diverge —
    * levels grow every round — so `maxRounds` exhaustion fails fast
    * with a cycle diagnosis instead of looping: run [[run]] +
    * [[condensation]] first, levels belong on the quotient. Output:
    * `(node, level)` for every node incident to an edge. */
  def topoLevels(edges: DataFrame, srcCol: String = "src",
                 dstCol: String = "dst", maxRounds: Int = 100): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be positive, got $maxRounds")
    val st = edges.schema(srcCol).dataType
    val dt = edges.schema(dstCol).dataType
    require(st == dt, s"topoLevels: edge endpoint types differ " +
      s"('$srcCol' is ${st.sql}, '$dstCol' is ${dt.sql}) — cast upstream")
    val adj = Checkpoints.cut(edges
      .select(col(srcCol).as("nu"), col(dstCol).as("nv"))
      .filter(col("nu").isNotNull && col("nv").isNotNull &&
        col("nu") =!= col("nv"))
      .select(xxhash64(col("nu")).as("u"), xxhash64(col("nv")).as("v"))
      .distinct()).persist()
    val dict = edges.select(col(srcCol).as("value"))
      .unionByName(edges.select(col(dstCol).as("value")))
      .filter(col("value").isNotNull)
      .distinct()
      .select(xxhash64(col("value")).as("id"), col("value"))
    var lvl = Checkpoints.cut(
      adj.select(col("u").as("node"))
        .unionByName(adj.select(col("v").as("node")))
        .distinct()
        .select(col("node"), lit(0L).as("level"))).persist()
    def levelSum(df: DataFrame): Long = {
      val r = df.agg(coalesce(sum("level"), lit(0L))).head
      r.getLong(0)
    }
    var prev = levelSum(lvl)
    var converged = adj.isEmpty
    var round = 0
    // maxRounds bounds the DAG DEPTH, not the iteration count:
    // convergence takes depth relax rounds PLUS one no-change round to
    // observe the fixpoint, so the loop allows maxRounds + 1 iterations
    // — a DAG of depth exactly maxRounds converges instead of tripping
    // the cycle diagnosis one round short
    while (!converged && round <= maxRounds) {
      val relaxed = lvl.join(adj, lvl("node") === adj("u"))
        .select(col("v").as("node"), (col("level") + 1L).as("level"))
      // lazy cut + levelSum = one job per round (the minLabelFixpoint
      // rationale); the sum is a lone full-scan aggregate, so it
      // materializes every checkpoint block it measures
      val next = Checkpoints.cutLazy(
        lvl.unionByName(relaxed)
          .groupBy("node").agg(max("level").as("level")))
      val cur = levelSum(next)
      lvl.unpersist()
      lvl = next
      converged = cur == prev
      prev = cur
      round += 1
    }
    require(converged, s"topoLevels: levels still growing after " +
      s"$maxRounds rounds — the graph has a directed cycle (or depth " +
      "> maxRounds); run Scc.condensation first and compute levels on " +
      "the quotient DAG")
    val out = Checkpoints.cut(lvl
      .join(dict.withColumnRenamed("id", "node"), Seq("node"))
      .select(col("value").as("node"), col("level")))
    adj.unpersist(); lvl.unpersist()
    out
  }

  /** Zero-in/out-degree bulk trim to fixpoint over the encoded
    * adjacency: one step keeps exactly the edges whose source has an
    * in-edge and whose target has an out-edge — nodes failing either
    * test cannot lie on a directed cycle, and removing them may expose
    * more (the Slota et al. Trim step; rationale in the object doc).
    * Cycle edges are never removed (every cycle node keeps in/out
    * degree ≥ 1 by induction), so the survivors contain every
    * non-singleton SCC. Each step is two degree semi-joins on 8-byte
    * keys, lineage-cut (a step references its input three times — an
    * un-cut composition would grow the plan 3^rounds). Returns `adj0`
    * ITSELF (reference-equal, caller skips the bookkeeping) when the
    * first step — the detector — removes nothing. A `maxTrim` cap-out
    * is safe: the residue falls through to FW-BW, which handles it
    * correctly, just slower. */
  private def trimFixpoint(adj0: DataFrame, maxTrim: Int): DataFrame = {
    def step(a: DataFrame): DataFrame = a
      .join(a.select(col("v").as("u")).distinct(), Seq("u"), "left_semi")
      .join(a.select(col("u").as("v")).distinct(), Seq("v"), "left_semi")
    var prev = adj0.count()
    if (prev == 0) return adj0
    var adj = adj0
    var done = false
    var rounds = 0
    while (!done && rounds < maxTrim) {
      // lazy cut + count = one job per trim round (minLabelFixpoint
      // rationale; the count materializes what it measures)
      val next = Checkpoints.cutLazy(step(adj)).persist()
      val n = next.count()
      if (n == prev) {
        next.unpersist()
        done = true
      } else {
        if (!(adj eq adj0)) adj.unpersist()
        adj = next
        prev = n
      }
      rounds += 1
    }
    adj
  }

  /** Min-label propagation to fixpoint over the DIRECTED encoded
    * adjacency, restricted to `nodes`: lab(v) = min id over {v} ∪
    * {u : u ⇝ v}. One equi-join + one min-fold per round on 8-byte
    * keys (the [[Bfs]] relaxation shape). Fixpoint when the exact
    * (count, Σlab) footprint is stable — labels only ever decrease and
    * the row count is fixed at |nodes|, so the decimal(38,0) sum is a
    * strictly-monotone progress measure that cannot wrap. */
  private def minLabelFixpoint(adj: DataFrame, nodes: DataFrame,
                               maxInner: Int): DataFrame = {
    def footprint(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(col("lab").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"))).head
      (r.getLong(0), r.getDecimal(1))
    }
    var lab = Checkpoints.cut(
      nodes.select(col("node"), col("node").as("lab")))
    var prev = footprint(lab)
    var converged = false
    var inner = 0
    while (!converged && inner < maxInner) {
      val relaxed = lab.join(adj, lab("node") === adj("u"))
        .select(col("v").as("node"), col("lab"))
      // LAZY cut: the footprint aggregation is the round's first action
      // and reads every row single-branch, so it both materializes the
      // checkpoint blocks and measures progress in ONE job — the eager
      // cut spent a separate job per round on materialization alone
      // (cutLazy's documented hazard — concurrent first reads through a
      // self-union — does not apply to a lone full-scan aggregate)
      val next = Checkpoints.cutLazy(
        lab.unionByName(relaxed)
          .groupBy("node").agg(min("lab").as("lab")))
      val cur = footprint(next)
      converged = cur._1 == prev._1 && cur._2.compareTo(prev._2) == 0
      prev = cur
      lab = next
      inner += 1
    }
    require(converged,
      s"scc: min-label propagation did not converge in $maxInner rounds " +
        "— raise maxInner (the graph's directed eccentricity exceeds it)")
    lab
  }
}
