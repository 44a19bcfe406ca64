package graft.bel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The BEL-graph layer: a property multigraph held as two DataFrames
  * (reference builds `pybel.BELGraph`, an in-memory networkx MultiDiGraph;
  * at 100 TB the nodes/edges DataFrames *are* the graph — SURVEY §3.3).
  *
  *  nodes(node_id, function, namespace, identifier, name)
  *  edges(src, dst, relation, citation, evidence, annotations: map)
  *
  * Edge identity (G8, reference dedups qualified edges by hash): an
  * explicit `edge_id` = xxhash64 over the qualifying tuple;
  * `dropDuplicates("edge_id")` reproduces BELGraph multigraph semantics —
  * parallel edges with different citations survive, exact duplicates don't.
  */
object Graph {

  /** Deterministic qualified-edge identity (G8). The annotations map is
    * part of the identity (BELGraph hashes the full qualified edge incl.
    * annotations — two edges differing only in annotations are distinct);
    * maps are unordered, so they are canonicalized to a sorted entry array
    * hashed structurally. */
  def edgeId(src: Column, dst: Column, relation: Column,
             citation: Column, evidence: Column,
             annotations: Column = lit(null)): Column = {
    // Structural canon: hash the sorted entry array itself (xxhash64 folds
    // nested struct fields with per-field boundaries), so distinct maps can
    // never serialize identically — no delimiter/escaping caveats.
    val canonicalAnnotations = array_sort(map_entries(
      coalesce(annotations.cast("map<string,string>"),
        typedlit(Map.empty[String, String]))))
    xxhash64(src, dst, relation, coalesce(citation, lit("")),
      coalesce(evidence, lit("")), canonicalAnnotations)
  }

  def withEdgeId(edges: DataFrame): DataFrame = {
    def opt(c: String): Column =
      if (edges.columns.contains(c)) col(c) else lit(null)
    val ann =
      if (edges.columns.contains("annotations")) col("annotations")
      else lit(null).cast("map<string,string>")
    edges.withColumn("edge_id",
      edgeId(col("src"), col("dst"), col("relation"),
        opt("citation"), opt("evidence"), ann))
  }

  /** BELGraph edge dedup: identical qualified edges collapse. */
  def dedupEdges(edges: DataFrame): DataFrame =
    withEdgeId(edges).dropDuplicates("edge_id")

  /** Node set implied by an edge set. */
  def nodesOf(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()

  /** A13 (reference summary_str: nodes/edges/citations/components/density,
    * published per-source in docstrings e.g. intact.py:174-191). Returns a
    * single-row DataFrame. Density = E / (V * (V - 1)) for a digraph. */
  def stats(edges: DataFrame, withComponents: Boolean = false): DataFrame = {
    // Work in the xxhash64 long domain from the first touch: ONE narrow
    // projection hashes endpoints + citation, the cached frame is 24
    // bytes/row instead of three strings, and every downstream pass — the
    // single fused count/node/citation aggregation AND the CC star loop —
    // scans and shuffles longs only. Distinct counts are therefore
    // hash-cardinalities: exact below ~10⁹ values (collision ~n²/2⁶⁴),
    // the same contract the CC label encoding already carries; above that,
    // switch the encoding to zipWithIndex. NULLs are hashed to NULL
    // explicitly (xxhash64(NULL) would return its seed, a COUNTABLE long)
    // so countDistinct skips them exactly as it does over the raw columns:
    // a null citation is no citation, a null endpoint is no node.
    def hashOrNull(c: Column): Column =
      when(c.isNull, lit(null).cast("long")).otherwise(xxhash64(c))
    val hasCitation = edges.columns.contains("citation")
    val ehRaw = edges.select(
      hashOrNull(col("src")).as("u"), hashOrNull(col("dst")).as("v"),
      (if (hasCitation) hashOrNull(col("citation"))
       else lit(null).cast("long")).as("c"))
    val eh =
      if (withComponents) graft.core.Checkpoints.cut(ehRaw)
      else ehRaw.cache()
    // With components, |V| falls out of the CC pass's own distinct-ids
    // frame, so the base aggregation is edge-count + one single-column
    // distinct — no endpoint explode, no multi-distinct Expand (which
    // triples the aggregated row count) — and it is crossJoined into the
    // CC summary's single final action rather than running as a job of
    // its own (the cache materializes during the CC loop's first round).
    // Without components there is no CC pass to piggyback on, so the
    // fused explode form computes all three in one job.
    val (nEdges, nCitations, nNodes, nComponents) =
      if (withComponents) {
        val (summary, cleanup) = ConnectedComponents.starSummary(
          eh.select(col("u"), col("v")))
        val row = try summary
          .crossJoin(eh.agg(count(lit(1)).as("n_edges"),
            countDistinct(col("c")).as("n_citations")))
          .collect().head
        finally cleanup()
        (row.getLong(3), row.getLong(4), row.getLong(2),
          row.getLong(0) + row.getLong(1))
      } else {
        val baseAgg = eh
          .select(explode(array(col("u"), col("v"))).as("node"), col("c"))
          .agg((count(lit(1)) / 2).cast("long").as("n_edges"),
            countDistinct(col("node")).as("n_nodes"),
            countDistinct(col("c")).as("n_citations")).collect().head
        (baseAgg.getLong(0), baseAgg.getLong(2), baseAgg.getLong(1), -1L)
      }
    val v = nNodes.toDouble
    val density = if (v > 1) nEdges / (v * (v - 1)) else 0.0
    val spark = edges.sparkSession
    import spark.implicits._
    val out = Seq((v.toLong, nEdges, nCitations, nComponents, density))
      .toDF("nodes", "edges", "citations", "components", "density")
    eh.unpersist()
    out
  }

  /** K8 (reference bel_manager.py:145-162): edge-list export — enumerate
    * sorted nodes to a dense index, then rewrite edges as index pairs.
    * Indexing is `sortWithinPartitions` over a range-partitioned sort +
    * `zipWithIndex` — a global total order WITHOUT the single-partition
    * `Window.orderBy` exchange (which would funnel every node through one
    * task at 10M+ nodes). */
  def indexedEdgeList(edges: DataFrame): (DataFrame, DataFrame) = {
    val spark = edges.sparkSession
    // The edge plan is read three times (both nodesOf union branches +
    // the index-rewrite join) — cut it once so the dedup/concat work
    // upstream runs a single time (r14). Lineage cut rather than
    // cache: both returned frames are consumed after this call returns,
    // so there is no scope to unpersist a cache safely. The cut frame is
    // the NARROW (src, dst) projection (r15, ADVICE): both outputs read
    // only the endpoints, so the localCheckpoint copies two columns per
    // row instead of the full edge payload (citation/evidence/
    // annotations) — smaller copy job, smaller executor storage.
    val e = graft.core.Checkpoints.cut(edges.select(col("src"), col("dst")))
    val nodes = nodesOf(e)
    // orderBy = range partition + local sort; zipWithIndex assigns globally
    // contiguous indices per partition-prefix without collapsing to 1 task.
    // The sorted RDD is cached first: zipWithIndex runs a per-partition
    // count job over it, and the src/dst joins evaluate it again — without
    // the cache the full union-distinct-sort pipeline runs three times.
    val sortedRdd = nodes.orderBy("node").rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = spark.createDataFrame(
      sortedRdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), i)
      },
      org.apache.spark.sql.types.StructType(
        nodes.schema.fields :+
          org.apache.spark.sql.types.StructField("node_index",
            org.apache.spark.sql.types.LongType, nullable = false)))
    val el = e.alias("e")
      .join(idx.alias("s"), col("e.src") === col("s.node"))
      .join(idx.alias("d"), col("e.dst") === col("d.node"))
      .select(col("s.node_index").as("src_index"),
        col("d.node_index").as("dst_index"))
    (idx, el)
  }

  /** K9 (reference io/automate.py:30-46): triples export shape. */
  def triples(edges: DataFrame): DataFrame =
    edges.select(col("src").as("head"), col("relation"), col("dst").as("tail"))
}
