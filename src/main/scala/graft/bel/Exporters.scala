package graft.bel

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Graph exporters (K7-K10; reference bel_manager.py:129-162,
  * io/automate.py:30-69, compath/manager.py:339-362).
  *
  * All exports are distributed write jobs over the nodes/edges
  * DataFrames — the in-memory graph of the reference disappears
  * (SURVEY §3.3). */
object Exporters {

  /** K7 nodelink JSON (reference to_nodelink_gz): the graph as two
    * gzip'd JSON-lines datasets, `<dir>/nodes` and `<dir>/links`
    * (distributed, one .json.gz per partition — the reference's single
    * .gz file would bottleneck on one writer at 100 TB; readers take the
    * directory transparently). Node ids are the canonical term strings. */
  def nodelink(edges: DataFrame, directory: String): Unit = {
    // The input plan is evaluated THREE times as written — nodesOf reads
    // it through both union branches and the links write reads it again.
    // One persist makes every read after the first hit cache (r14); at
    // 100 TB this is two corpus passes saved per export. Persist a
    // method-local NARROW projection, not the caller's frame (r15,
    // ADVICE): only src/dst/relation are read, so the cached footprint
    // drops the citation/evidence/annotations payload — and unpersist
    // can never clobber a cache the caller holds on `edges` itself.
    val e = edges.select(col("src"), col("dst"), col("relation")).persist()
    try {
      Graph.nodesOf(e)
        .select(col("node").as("id"))
        .write.mode(SaveMode.Overwrite).option("compression", "gzip")
        .json(s"$directory/nodes")
      e.select(col("src").as("source"), col("dst").as("target"),
          col("relation"))
        .write.mode(SaveMode.Overwrite).option("compression", "gzip")
        .json(s"$directory/links")
    } finally { e.unpersist() }
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

  /** K13: a foreign-key edge for the ER diagram — `fromTable.fromCol`
    * references `toTable.toCol` (an M:N association table carries two). */
  final case class ErRelation(fromTable: String, fromCol: String,
                              toTable: String, toCol: String)

  /** K13 ER-diagram export (reference cli.py:236-254 renders each
    * source's SQLAlchemy base with eralchemy): the engine's fixed
    * code-declared schemas are `StructType`s, so the diagram derives from
    * them — emitted in eralchemy's own intermediate ER-markdown format
    * (`[table]` blocks, `*`-prefixed keys, `{label:"type"}` column types,
    * `1--*` cardinality lines), deterministic via sorted tables/columns.
    * Text, not an image: zero-egress, diffable, and renderable by any
    * eralchemy-compatible tool downstream. */
  def erDiagram(tables: Seq[(String, StructType)],
                relations: Seq[ErRelation],
                primaryKeys: Map[String, String] = Map.empty): String = {
    val tableBlocks = tables.sortBy(_._1).map { case (name, schema) =>
      val cols = schema.fields.map { f =>
        val star = if (primaryKeys.get(name).contains(f.name)) "*" else ""
        s"""  $star${f.name} {label:"${f.dataType.catalogString}"}"""
      }
      (s"[$name]" +: cols.toSeq).mkString("\n")
    }
    val relLines = relations
      .map(r => s"${r.toTable} 1--* ${r.fromTable}")
      .distinct.sorted
    (tableBlocks ++ relLines).mkString("", "\n\n", "\n")
  }
}
