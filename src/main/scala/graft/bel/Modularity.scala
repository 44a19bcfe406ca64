package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment (Newman & Girvan 2004) —
  * the quality score for [[LabelPropagation]]'s output (and any other
  * labeling): Q = Σ_c [ L_c/m − (D_c/2m)² ], where L_c is the
  * community's internal undirected edge count, D_c its degree mass and
  * m the graph's undirected edge count. High-Q labelings mean the
  * communities are denser inside than a degree-preserving random graph
  * would predict — the accept/reject metric a curation pipeline applies
  * before trusting discovered domain clusters.
  *
  * Graph semantics match [[LabelPropagation]] exactly: undirected,
  * de-duplicated, self-loops dropped — so scoring LPA's own labeling
  * needs no re-canonicalization. Unlabeled nodes are ignored (their
  * edges count toward m but join no community; pass a complete labeling
  * for the textbook score).
  *
  * Scale shape: two equi-joins of the edge set against the label
  * vector + per-label hash aggregations, all DICT-ENCODED — node and
  * label values hash to longs (`xxhash64`, the [[PageRank]] posture
  * with the same negligible-collision caveat; nothing here orders by
  * id, so the hash encode suffices where LPA's loop needs
  * order-preserving ids), every join and aggregation keys on 8 bytes,
  * and the label VALUES come back through one community-count-sized
  * dictionary join at the rim. m rides the plan as a 1-row crossJoined
  * aggregate (never a driver literal). All inputs to the final
  * arithmetic are exact integer counts, and the Q expression is
  * written identically in the SQL oracle — value-exact doubles.
  */
object Modularity {

  /** Per-community modularity terms over `edges(src, dst)` and
    * `labels(node, label)`: `(label, n_nodes, l_c, d_c, q_c)`; total
    * Q = Σ q_c. */
  def perCommunity(edges: DataFrame, labels: DataFrame): DataFrame = {
    // xxhash64 hashes by PHYSICAL type — a labels frame whose node type
    // differs from the edge endpoints would silently join nothing
    Bfs.requireSameKeyType("Modularity.perCommunity", edges, "src",
      "dst", labels, "node", "labels node")
    // the SAME canonicalization LPA labels over — shared, not mirrored
    // (null/self-loop dropping happens on VALUES, before the encode)
    val und = LabelPropagation.undirectedSimple(edges)
      .select(xxhash64(col("u")).as("u"), xxhash64(col("v")).as("v"))
    // encoded labeling + the label-value dictionary for the rim decode
    val lab = labels.filter(col("node").isNotNull)
      .select(xxhash64(col("node")).as("node"),
        xxhash64(col("label")).as("lid"))
    val ldict = labels.select(col("label")).distinct()
      .select(xxhash64(col("label")).as("lid"), col("label"))
    val deg = und.groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("deg"))
    val m = und.agg((count(lit(1)) / 2).as("m")) // |und| is even: exact
    val intra = und
      .join(lab.select(col("node").as("u"), col("lid").as("cu")),
        Seq("u"))
      .join(lab.select(col("node").as("v"), col("lid").as("cv")),
        Seq("v"))
      .filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("lid"))
      .agg((count(lit(1)) / 2).as("l_c"))
    val dsum = deg.join(lab, Seq("node"))
      .groupBy("lid")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("d_c"))
    dsum.join(intra, Seq("lid"), "left")
      .crossJoin(m)
      .join(ldict, Seq("lid"))
      .select(col("label"), col("n_nodes"),
        coalesce(col("l_c"), lit(0.0)).as("l_c"),
        col("d_c").cast("double").as("d_c"),
        (coalesce(col("l_c"), lit(0.0)) / col("m") -
          (col("d_c") / (lit(2.0) * col("m"))) *
            (col("d_c") / (lit(2.0) * col("m")))).as("q_c"))
  }
}
