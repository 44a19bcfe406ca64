package graft.bel

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Graph exporters (K7-K10; reference bel_manager.py:129-162,
  * io/automate.py:30-69, compath/manager.py:339-362).
  *
  * All exports are distributed write jobs over the nodes/edges
  * DataFrames — the in-memory graph of the reference disappears
  * (SURVEY §3.3). */
object Exporters {

  /** K7 nodelink JSON (reference to_nodelink_gz): the graph as two
    * JSON-lines datasets, `<dir>/nodes` and `<dir>/links` (distributed —
    * a single .gz file would bottleneck on one writer at 100 TB). Node
    * ids are the canonical term strings. */
  def nodelink(edges: DataFrame, directory: String): Unit = {
    Graph.nodesOf(edges)
      .select(col("node").as("id"))
      .write.mode(SaveMode.Overwrite).json(s"$directory/nodes")
    edges
      .select(col("src").as("source"), col("dst").as("target"),
        col("relation"))
      .write.mode(SaveMode.Overwrite).json(s"$directory/links")
  }

  /** K8 edge-list + node-list export (bel_manager.py:145-162): dense
    * sorted node indices via zipWithIndex (no single-partition window). */
  def edgelist(edges: DataFrame, directory: String): Unit = {
    val (idx, el) = Graph.indexedEdgeList(edges)
    idx.write.mode(SaveMode.Overwrite)
      .option("sep", " ").option("header", "true").csv(s"$directory/node_list")
    el.write.mode(SaveMode.Overwrite)
      .option("sep", " ").csv(s"$directory/edgelist")
  }

  /** K9 triples TSV (io/automate.py:30-46). */
  def triples(edges: DataFrame, directory: String): Unit =
    Graph.triples(edges)
      .write.mode(SaveMode.Overwrite).option("sep", "\t").csv(directory)

  /** K10 gene-set TSV (compath/manager.py:352-361): exploded
    * (pathway, symbol) rows. `geneSets` columns: (identifier|name,
    * gene_set array). */
  def geneSetsTsv(geneSets: DataFrame, directory: String): Unit = {
    val key = geneSets.columns.head
    geneSets
      .select(col(key), explode(col("gene_set")).as("hgnc_symbol"))
      .write.mode(SaveMode.Overwrite).option("sep", "\t").csv(directory)
  }
}
