package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counts and local clustering coefficients — the graph
  * cohesion statistic beside [[ConnectedComponents]] (membership) and
  * [[PageRank]] (centrality). The reference's summaries stop at simple
  * counts (`manager/abstract_manager.py:224` summarize,
  * `manager/bel_manager.py:52` count_relations); clustering is the next
  * statistic the same graph surface serves, and at corpus scale (entity
  * co-occurrence graphs) it needs the distributed formulation, not a
  * node-local adjacency walk.
  *
  * Algorithm: degree-ordered orientation (node-iterator++ — the
  * MapReduce-standard triangle scheme, cf. Suri & Vassilvitskii WWW 2011):
  * each undirected edge orients from its (degree, id)-smaller endpoint to
  * the larger; every triangle then has exactly ONE source node emitting
  * the wedge that closes it, so each triangle is found once, and a node's
  * oriented out-degree is O(√m) on any graph — the hot high-degree hub
  * never enumerates its full neighborhood against itself, which is what
  * kills the naive wedge join on skewed (power-law) graphs.
  *
  * Plan shape: canonical-undirected distinct → degree aggregation → two
  * dimension joins to attach endpoint degrees → wedge self-join keyed on
  * the wedge apex → closing equi-join on the (lo, hi) endpoint pair —
  * every join an equi-join on node ids (xxhash64-encoded, the
  * [[ConnectedComponents]] collision contract), AQE free to broadcast
  * the degree side. Nothing quadratic, nothing nested-loop.
  *
  * Output: (node, deg, triangles, lcc) per node of the simple undirected
  * graph — self-loops dropped, parallel edges collapsed, isolated nodes
  * absent by construction (no edge ⇒ not in the edge list). lcc =
  * 2·triangles / (deg·(deg−1)) for deg ≥ 2, else 0.0 — one double
  * division of exact integers, reproducible bit-for-bit across engines.
  */
object Triangles {

  def localTriangles(edges: DataFrame): DataFrame = {
    // persisted: the caller's edge-construction plan may be expensive
    // (e.g. a co-occurrence self-join), and und is read by THREE
    // downstream consumers (nodes, deg, orientation) — uncached, each
    // would re-run the whole upstream build
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

    val e = und.select(xxhash64(col("a")).as("u"),
      xxhash64(col("b")).as("v"))

    val deg = e.select(col("u").as("id"))
      .unionByName(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .persist()

    // orientation key: (degree, id) — a total order, so each undirected
    // edge orients exactly once and out-neighborhoods stay O(√m)
    val withDeg = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    val uKey = struct(col("du").as("d"), col("u").as("n"))
    val vKey = struct(col("dv").as("d"), col("v").as("n"))
    // lazy persist — no eager count job; the output's lineage-cut action
    // materializes the whole chain once, and the three oriented readers
    // (two wedge sides + closing edges) share the cached blocks
    val oriented = withDeg.select(
      when(uKey < vKey, col("u")).otherwise(col("v")).as("x"),
      when(uKey < vKey, col("v")).otherwise(col("u")).as("y"),
      when(uKey < vKey, vKey).otherwise(uKey).as("ykey"))
      .persist()

    // wedges from each apex x: ordered pairs of out-neighbors; the closing
    // edge {y1, y2}, if present, is oriented y1→y2 by the same total order
    val o1 = oriented.select(col("x"), col("y").as("y1"),
      col("ykey").as("k1"))
    val o2 = oriented.select(col("x"), col("y").as("y2"),
      col("ykey").as("k2"))
    val wedges = o1.join(o2, Seq("x")).filter(col("k1") < col("k2"))
    val closing = oriented.select(col("x").as("y1"), col("y").as("y2"))
    val tris = wedges.join(closing, Seq("y1", "y2"))
      .select(col("x"), col("y1"), col("y2"))

    val perNode = tris.select(col("x").as("id"))
      .unionByName(tris.select(col("y1").as("id")))
      .unionByName(tris.select(col("y2").as("id")))
      .groupBy("id").agg(count(lit(1)).as("triangles"))

    val out = graft.core.Checkpoints.cut(
      nodes.join(deg, Seq("id"))
        .join(perNode, Seq("id"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .withColumn("lcc",
          when(col("deg") >= 2,
            (lit(2) * col("triangles")).cast("double") /
              (col("deg") * (col("deg") - 1)).cast("double"))
            .otherwise(lit(0.0))))
    // output is materialized (lineage cut severs it from the cached
    // frames), so the caches release here instead of accumulating over a
    // long session — the PageRank / ConnectedComponents convention
    nodes.unpersist()
    deg.unpersist()
    oriented.unpersist()
    und.unpersist()
    out
  }
}
