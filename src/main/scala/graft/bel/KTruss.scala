package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition (Cohen, "Trusses: cohesive subgraphs for social
  * network analysis", NSA TR 2008): the maximal subgraph in which every
  * edge closes at least k−2 triangles WITHIN the subgraph — the
  * edge-cohesion analogue of [[KCore]]'s node peeling, and the standard
  * community-core extractor one notch stronger than cores (every k-truss
  * is inside the (k−1)-core). Same graph surface as
  * [[Triangles]]/[[KCore]] (the reference stops at counts;
  * `manager/abstract_manager.py:224`).
  *
  * Algorithm: support peeling — iteratively drop every edge whose
  * triangle support in the CURRENT survivor graph is < k−2, until
  * fixpoint. The graph orients ONCE by the (degree, id) total order
  * ([[Triangles]]' Suri–Vassilvitskii posture: oriented out-degrees
  * stay O(√m), so hub neighborhoods never self-join); each round then
  * enumerates triangles of the oriented SURVIVOR list and counts each
  * into its THREE canonical edges — per round: one wedge equi-join, one
  * closing equi-join, one map-side-combined support aggregation, one
  * survivor filter join. Nothing quadratic; ids ride the loop
  * xxhash64-encoded (8-byte shuffle keys, the PageRank encode posture)
  * and decode once at the rim.
  *
  * Bounded-round contract: `maxRounds` caps the peel; the gate runs a
  * fixed small bound whose unrolled SQL oracle is engine-identical by
  * construction (each oracle level IS one peel — the a37 weighted-paths
  * discipline), while the operator's default runs to fixpoint (the loop
  * stops early the first round nothing drops — peeling is monotone, so
  * a fixpoint is final). Lineage cuts every round (the LPA/CC loop
  * convention). Output: surviving canonical edges `(a, b)` with
  * `a = least(value), b = greatest(value)`.
  */
object KTruss {

  def run(edges: DataFrame, k: Int, maxRounds: Int = 50): DataFrame = {
    require(k >= 2, s"k-truss needs k >= 2, got $k")
    require(maxRounds >= 1, s"maxRounds must be positive, got $maxRounds")
    val (oriented, nodes, und) = prepare(edges)
    // the 2-truss is the whole simple graph (every edge has ≥ 0
    // triangles); skip the loop rather than special-case the filter.
    // run() has no later use for the initial oriented list, so the
    // fixpoint loop releases it after round 1 (peak cache stays at two
    // live frames); trussness keeps it for the dropped-edge anti-join.
    val survivors =
      if (k == 2) oriented
      else peelFixpoint(oriented, k, maxRounds, releaseInput = true)._1
    val out = graft.core.Checkpoints.cut(decode(survivors, nodes)
      .select(col("a"), col("b")))
    survivors.unpersist()
    nodes.unpersist(); und.unpersist()
    out
  }

  /** Trussness decomposition: every edge's MAXIMUM k such that it
    * survives the k-truss — the full cohesion profile in one call (the
    * edge analogue of a node's core number). Ascending-k peel: the
    * k-truss survivors feed the (k+1)-peel, and edges dropped by the
    * k-peel have trussness k−1 (an edge in no triangle has trussness
    * 2). Each k-level runs [[peelOnce]] to ITS fixpoint, so total work
    * is the k-truss loop summed over the distinct trussness levels
    * actually present — never maxK × corpus.
    *
    * The `maxK` cap is TRUTHFUL, not silent: survivors of the maxK-peel
    * run ONE extra peel at maxK+1, and an edge surviving that too
    * reports `(trussness = maxK, capped = true)` — "at least maxK,
    * raise the cap to measure" — while an edge the extra peel drops
    * reports `(maxK, capped = false)`: exactly maxK, a measurement.
    * Every edge dropped below the cap is `capped = false` by
    * construction. Downstream can therefore never mistake the cap for
    * a measurement (the bounded-round a37 discipline, made visible in
    * the output).
    *
    * `maxRounds` caveat at the boundary — MACHINE-READABLE via
    * `cap_converged`: the maxK+1 peel is itself bounded by `maxRounds`.
    * Drops stay exact measurements even if that peel is truncated
    * (peeling is monotone — an edge dropped at ANY round is
    * definitively outside the (maxK+1)-truss, so "exactly maxK"
    * holds), but a truncated peel's SURVIVORS may include exactly-maxK
    * edges still awaiting their drop. [[peelFixpoint]] therefore
    * RETURNS its convergence, folded into the output:
    * `capped ∧ cap_converged` = "in the (maxK+1)-truss — trussness
    * strictly exceeds maxK; raise maxK to measure";
    * `capped ∧ ¬cap_converged` = the honest weaker claim "trussness ≥
    * maxK — raise maxRounds to tighten". Measured rows (capped =
    * false) always carry `cap_converged = true`, so downstream can
    * filter on ONE column pair instead of reading scaladoc.
    * Output: (a, b, trussness, capped, cap_converged). */
  def trussness(edges: DataFrame, maxK: Int = 16,
                maxRounds: Int = 50): DataFrame = {
    require(maxK >= 3, s"trussness needs maxK >= 3, got $maxK")
    require(maxRounds >= 1, s"maxRounds must be positive, got $maxRounds")
    val (oriented, nodes, und) = prepare(edges)
    var current = oriented
    var k = 3
    var acc: Option[DataFrame] = None
    var remaining = current.count()
    while (remaining > 0 && k <= maxK) {
      val (next, _) = peelFixpoint(current, k, maxRounds)
      val dropped = current
        .join(next.select("x", "y"), Seq("x", "y"), "left_anti")
        .select(col("x"), col("y"), lit(k - 1).as("trussness"),
          lit(false).as("capped"))
      val labeled = graft.core.Checkpoints.cutLazy(
        acc.map(_.unionByName(dropped)).getOrElse(dropped)).persist()
      labeled.count()
      acc.foreach(_.unpersist())
      acc = Some(labeled)
      current.unpersist()
      current = next
      remaining = next.count()
      k += 1
    }
    // one extra peel at maxK+1 makes the cap truthful: its survivors are
    // "≥ maxK" (capped), its drops are exactly maxK (measured) — peeling
    // past an empty survivor set is skipped, nothing there to label
    var beyondHandle: Option[DataFrame] = None
    var capConverged = true
    val atCap =
      if (remaining == 0)
        current.select(col("x"), col("y"), lit(maxK).as("trussness"),
          lit(false).as("capped"))
      else {
        val (beyond, beyondConverged) =
          peelFixpoint(current, maxK + 1, maxRounds)
        beyondHandle = Some(beyond)
        // fold the peel's convergence into the cap: survivors of a
        // CONVERGED peel are in the (maxK+1)-truss (trussness > maxK);
        // of a truncated one, only "≥ maxK" — cap_converged carries
        // the distinction (scaladoc contract)
        capConverged = beyondConverged
        current.join(
            beyond.select(col("x"), col("y"), lit(true).as("__cap")),
            Seq("x", "y"), "left")
          .select(col("x"), col("y"), lit(maxK).as("trussness"),
            coalesce(col("__cap"), lit(false)).as("capped"))
      }
    val all = acc.map(_.unionByName(atCap)).getOrElse(atCap)
      .withColumn("cap_converged", !col("capped") || lit(capConverged))
    val out = graft.core.Checkpoints.cut(
      decode(all, nodes).select(col("a"), col("b"), col("trussness"),
        col("capped"), col("cap_converged")))
    beyondHandle.foreach(_.unpersist())
    current.unpersist(); acc.foreach(_.unpersist())
    nodes.unpersist(); und.unpersist()
    out
  }

  /** Canonicalize + encode + orient ONCE: the (degree, id) total order
    * only has to be consistent to count each triangle exactly once, so
    * the initial-graph degrees stay a valid (if staleness-suboptimal)
    * order for every later round — peeling then just FILTERS the
    * oriented list, and the per-round work drops to wedge join +
    * closing join + support aggregation + survivor filter. This is
    * also the production-truss posture (orientation reuse between peel
    * rounds); re-orienting by live degree each round costs a degree
    * aggregation plus two joins per round for a second-order
    * wedge-size improvement. Returns (oriented [persisted], node
    * dictionary [persisted], canonical value edges [persisted]). */
  private def prepare(edges: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val und = edges
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .persist()
    val nodes = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .distinct()
      .withColumn("id", xxhash64(col("node")))
      .persist()
    val enc = und.select(xxhash64(col("a")).as("u"),
      xxhash64(col("b")).as("v"))
    val deg = enc.select(col("u").as("id"))
      .unionByName(enc.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val uKey = struct(col("du").as("d"), col("u").as("n"))
    val vKey = struct(col("dv").as("d"), col("v").as("n"))
    val oriented = graft.core.Checkpoints.cut(enc
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(uKey < vKey, col("u")).otherwise(col("v")).as("x"),
        when(uKey < vKey, col("v")).otherwise(col("u")).as("y"),
        when(uKey < vKey, vKey).otherwise(uKey).as("ykey")))
      .persist()
    (oriented, nodes, und)
  }

  /** Peel at one k until fixpoint (or the round cap): peeling is
    * monotone, so the first round that drops nothing is final. Input
    * must be persisted; returns a NEW persisted survivor frame (the
    * loop always runs at least one round). Intermediate rounds are
    * released as they are superseded; the INPUT is released after
    * round 1 only when `releaseInput` — callers that still need it
    * (trussness's dropped-edge anti-join) keep ownership. */
  /** Returns (survivors, converged): `converged = false` means the
    * round cap truncated the peel — survivors then over-approximate
    * the k-truss (drops are always exact; peeling is monotone).
    * [[trussness]] folds the flag into its `cap_converged` column. */
  private def peelFixpoint(oriented0: DataFrame, k: Int, maxRounds: Int,
                           releaseInput: Boolean = false)
      : (DataFrame, Boolean) = {
    var oriented = oriented0
    var round = 0
    var done = false
    var nEdges = oriented.count()
    while (!done && round < maxRounds) {
      // lazy cut materialized by the survivor count — one job per peel
      // round instead of two (the Scc minLabelFixpoint discipline: the
      // count is the round's first action and single-branch; the next
      // round's three-branch read hits the persisted blocks)
      val next = graft.core.Checkpoints.cutLazy(peelOnce(oriented, k))
        .persist()
      val n2 = next.count()
      if (!(oriented eq oriented0) || releaseInput) oriented.unpersist()
      oriented = next
      done = n2 == nEdges || n2 == 0
      nEdges = n2
      round += 1
    }
    (oriented, done)
  }

  /** Map encoded survivor endpoints back to canonical VALUE pairs,
    * carrying any extra columns through. */
  private def decode(survivors: DataFrame, nodes: DataFrame): DataFrame = {
    val extra = survivors.columns.toSeq
      .filterNot(c => c == "x" || c == "y" || c == "ykey")
    survivors
      .join(nodes.select(col("id").as("x"), col("node").as("na")), "x")
      .join(nodes.select(col("id").as("y"), col("node").as("nb")), "y")
      .select(least(col("na"), col("nb")).as("a") +:
        greatest(col("na"), col("nb")).as("b") +:
        extra.map(col): _*)
  }

  /** One support-peel round over the oriented survivor list: wedges from
    * each apex close against the oriented edge set, each triangle counts
    * into its three edges (canonical (min, max) id pairs), and survivors
    * keep support ≥ k−2 — an edge in NO triangle has no support row and
    * drops via the inner join (support 0 < k−2 for every k ≥ 3). The
    * survivor filter re-derives the canonical pair from (x, y), so the
    * oriented frame flows through rounds unchanged in shape. */
  private[bel] def peelOnce(oriented: DataFrame, k: Int): DataFrame = {
    val o1 = oriented.select(col("x"), col("y").as("y1"),
      col("ykey").as("k1"))
    val o2 = oriented.select(col("x"), col("y").as("y2"),
      col("ykey").as("k2"))
    val tris = o1.join(o2, Seq("x")).filter(col("k1") < col("k2"))
      .join(oriented.select(col("x").as("y1"), col("y").as("y2")),
        Seq("y1", "y2"))
      .select(col("x"), col("y1"), col("y2"))
    val contrib = tris.select(least(col("x"), col("y1")).as("u"),
        greatest(col("x"), col("y1")).as("v"))
      .unionByName(tris.select(least(col("x"), col("y2")).as("u"),
        greatest(col("x"), col("y2")).as("v")))
      .unionByName(tris.select(least(col("y1"), col("y2")).as("u"),
        greatest(col("y1"), col("y2")).as("v")))
    val sup = contrib.groupBy("u", "v").agg(count(lit(1)).as("sup"))
    oriented
      .withColumn("u", least(col("x"), col("y")))
      .withColumn("v", greatest(col("x"), col("y")))
      .join(sup, Seq("u", "v")).filter(col("sup") >= k - 2)
      .select(col("x"), col("y"), col("ykey"))
  }
}
