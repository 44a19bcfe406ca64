package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** HITS hubs-and-authorities (Kleinberg, "Authoritative sources in a
  * hyperlinked environment", JACM 46(5), 1999) — the directed
  * link-analysis pair to [[PageRank]]: an AUTHORITY is pointed at by
  * good hubs, a HUB points at good authorities. Web-crawl curation uses
  * both sides where PageRank gives one number: authority scores rank
  * content pages for seed selection, hub scores rank link/directory
  * pages for frontier expansion.
  *
  * Fixed-iteration mutual power method on the DISTINCT directed edge
  * set, L2-normalized each half-step (Kleinberg's normalization —
  * IEEE sqrt is correctly rounded, so even the norms are
  * engine-bit-identical; only sum accumulation order is float-loose,
  * the a38 tolerant-compare posture):
  *
  *   a(v) ← Σ_{(u,v)∈E} h(u) / ‖·‖₂,   h(u) ← Σ_{(u,v)∈E} a(v) / ‖·‖₂
  *
  * Fixed iterations, not a convergence test — the deterministic-
  * function contract every oracle-gated iterative operator here keeps
  * (the unrolled-CTE oracle runs the same count).
  *
  * Scale shape (the [[PageRank]] loop discipline): endpoints
  * dict-encode to longs, the adjacency is built ONCE and persisted,
  * and each iteration is two equi-join + hash-aggregation pairs on
  * 8-byte keys; the L2 norms ride the plan as 1-row crossJoined
  * aggregates — no per-iteration driver round-trip. Lineage-cut per
  * iteration. Nodes on no in-edge keep authority 0 (and hubs
  * symmetric) but stay in the output.
  *
  * Output: `(node, hub, authority)` for every node incident to an
  * edge. */
object Hits {

  def run(edges: DataFrame, iterations: Int = 8): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .filter(col("node").isNotNull)
      .distinct()
      .withColumn("id", xxhash64(col("node")))
      .persist()
    val adj = edges
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .select(xxhash64(col("src")).as("u"), xxhash64(col("dst")).as("v"))
      .distinct()
      .persist()
    val ids = nodes.select(col("id"))
    // h₀ = 1 everywhere (the standard start; the first normalization
    // rescales it, so any positive constant is equivalent)
    var hub = Checkpoints.cut(ids.select(col("id"), lit(1.0).as("h")))
    var auth = ids.select(col("id"), lit(0.0).as("a"))
    // BOTH half-steps lineage-cut: a lazy authority frame (one cut per
    // iteration, the PageRank cutEvery idea) was MEASURED SLOWER here
    // (3.63 s vs 3.33 s min-of-3 at the a47 gate) — the auth subplan is
    // referenced twice (norm aggregate + hub join) and its recompute
    // costs more than the saved materialization job.
    for (_ <- 1 to iterations) {
      val aRaw = adj.join(hub.withColumnRenamed("id", "u"), Seq("u"))
        .groupBy(col("v").as("id")).agg(sum("h").as("a0"))
      val aFull = ids.join(aRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("a0"), lit(0.0)).as("a0"))
      val aNorm = aFull.agg(sqrt(sum(col("a0") * col("a0"))).as("na"))
      auth = Checkpoints.cut(aFull.crossJoin(aNorm)
        .select(col("id"), when(col("na") > 0.0, col("a0") / col("na"))
          .otherwise(lit(0.0)).as("a")))
      val hRaw = adj.join(auth.withColumnRenamed("id", "v"), Seq("v"))
        .groupBy(col("u").as("id")).agg(sum("a").as("h0"))
      val hFull = ids.join(hRaw, Seq("id"), "left")
        .select(col("id"), coalesce(col("h0"), lit(0.0)).as("h0"))
      val hNorm = hFull.agg(sqrt(sum(col("h0") * col("h0"))).as("nh"))
      hub = Checkpoints.cut(hFull.crossJoin(hNorm)
        .select(col("id"), when(col("nh") > 0.0, col("h0") / col("nh"))
          .otherwise(lit(0.0)).as("h")))
    }
    val out = Checkpoints.cut(nodes
      .join(hub, Seq("id"))
      .join(auth, Seq("id"))
      .select(col("node"), col("h").as("hub"), col("a").as("authority")))
    nodes.unpersist(); adj.unpersist()
    out
  }
}
