package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** Deterministic graph random walks — the corpus generator for
  * KG/graph-embedding training (DeepWalk/node2vec posture: walks are the
  * "sentences" a skip-gram embedder consumes). The reference exports
  * triples exactly for embedding training (`io/automate.py:30-46`,
  * PyKEEN); walk generation is the next step of that same surface, and
  * at corpus scale it must be a per-step relational join, never a
  * driver-side graph traversal.
  *
  * Determinism is the design point: step t of walk w moves to the
  * neighbor minimizing `(md5(w ":" t ":" neighbor), neighbor)` — a
  * hash-seeded uniform-ish pick that is partitioning-, run- and
  * ENGINE-independent (md5 hex is byte-identical everywhere), so walks
  * are reproducible across dataset versions and oracle-checkable. No
  * `rand()` anywhere — the same discipline as the hash-split/resample
  * family (`ops/TrainingPrep.hashSplit`).
  *
  * Scale shape: one walk frontier row per walker; each step is ONE
  * equi-join frontier⋈adjacency on the current node plus ONE
  * hash-aggregation (min-struct argmin per walker) — no windows, no
  * per-walker state, frontiers lineage-cut per step so step t+1 never
  * replays step t's plan. Walk count scales with nodes, steps is a small
  * constant; everything shuffles on walker/node keys only.
  *
  * Output: (walk_id, pos, node) — walk_id is the start node, pos
  * 0..steps. On an undirected adjacency every walk completes (a reached
  * node always has the arriving edge back); a walker reaching a node
  * with no outgoing edges (directed dead end) simply emits no further
  * positions.
  */
object RandomWalks {

  def walks(edges: DataFrame, steps: Int,
            srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(steps >= 0, s"steps must be >= 0, got $steps")
    val adj = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .distinct()
      .persist()
    adj.count()

    var frontier = Checkpoints.cut(
      adj.select(col("u").as("walk_id")).distinct()
        .withColumn("cur", col("walk_id")))
    var out = frontier.select(col("walk_id"), lit(0).as("pos"),
      col("cur").as("node"))
    for (t <- 1 to steps) {
      val draw = md5(concat(col("walk_id").cast("string"),
        lit(s":$t:"), col("v").cast("string")))
      val picked = Checkpoints.cut(
        frontier.join(adj, frontier("cur") === adj("u"))
          .select(col("walk_id"), struct(draw.as("h"), col("v")).as("hv"))
          .groupBy("walk_id").agg(min("hv").as("pick"))
          .select(col("walk_id"), col("pick.v").as("cur")))
      out = out.unionByName(picked.select(col("walk_id"),
        lit(t).as("pos"), col("cur").as("node")))
      frontier = picked
    }
    val result = Checkpoints.cut(out)
    adj.unpersist()
    result
  }

  /** GraphSAGE-style neighbor-FANOUT sampling (Hamilton, Ying &
    * Leskovec, "Inductive representation learning on large graphs",
    * NeurIPS 2017): per hop t, every frontier node keeps at most
    * `fanouts(t)` neighbors — the bounded computation DAG a GNN
    * minibatch trains on, extracted relationally ("the 10-25-sampled
    * 2-hop neighborhood of these seeds" without ever materializing the
    * full neighborhood explosion). Same determinism contract as
    * [[walks]]: the kept neighbors are the k smallest
    * `(md5(u ":" hop ":" v), v)` — hash-seeded uniform-ish, engine- and
    * partitioning-independent, no `rand()`. The draw is per (parent,
    * hop), not per seed, so overlapping seed neighborhoods sample
    * IDENTICAL edges — the cacheable-expansion property real samplers
    * exploit.
    *
    * Scale shape: per hop ONE frontier⋈adjacency equi-join and ONE
    * bounded top-k aggregation ([[graft.ops.Rank.topKPerGroup]]'s
    * native k-row buffers — only `parents × k` rows cross the
    * exchange, the o11 posture; a row_number window would ship every
    * candidate edge through one task per parent). Frontiers dedup per
    * (seed, node) so a node reached twice in a hop expands once.
    *
    * Output: `(seed, hop, src, dst)` — the sampled edges, hop 1-based;
    * a seed absent from the graph contributes nothing. */
  def neighborFanout(edges: DataFrame, seeds: DataFrame,
                     fanouts: Seq[Int], srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    require(fanouts.nonEmpty, "neighborFanout needs at least one fanout")
    require(fanouts.forall(_ >= 1),
      s"fanouts must be >= 1, got ${fanouts.mkString(", ")}")
    val seedCol = seeds.columns.head
    val adj = Checkpoints.cut(edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .distinct())
    var frontier = seeds.select(col(seedCol).as("seed")).distinct()
      .withColumn("node", col("seed"))
    var out: DataFrame = null
    for ((k, i) <- fanouts.zipWithIndex) {
      val hop = i + 1
      val cand = frontier.join(adj, frontier("node") === adj("u"))
        .select(col("seed"), col("u"), col("v"),
          md5(concat(col("u").cast("string"), lit(s":$hop:"),
            col("v").cast("string"))).as("h"))
      val picked = Checkpoints.cut(
        graft.ops.Rank.topKPerGroup(cand, Seq("seed", "u"),
            Seq("h", "v"), k)
          .select(col("seed"), lit(hop).as("hop"), col("u").as("src"),
            col("v").as("dst")))
      out = if (out == null) picked else out.unionByName(picked)
      frontier = picked.select(col("seed"), col("dst").as("node"))
        .distinct()
    }
    out
  }

  /** Skip-gram (center, context) pair extraction from a walk corpus —
    * the final hop to embedder input: every ordered pair of walk
    * positions within `window` of each other, aggregated to counts.
    * The self-join is on walk_id with a position-band post-filter, so
    * fan-out is ≤ 2·window·(steps+1) per walk — bounded by construction,
    * never corpus-quadratic. Output: (center, context, n). */
  def skipGramPairs(walkRows: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val a = walkRows.select(col("walk_id"), col("pos").as("p1"),
      col("node").as("center"))
    val b = walkRows.select(col("walk_id"), col("pos").as("p2"),
      col("node").as("context"))
    a.join(b, Seq("walk_id"))
      .filter(col("p1") =!= col("p2") &&
        abs(col("p1") - col("p2")) <= window)
      .groupBy("center", "context")
      .agg(count(lit(1)).as("n"))
  }
}
