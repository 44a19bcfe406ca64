package graft.compath

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A pathway-style store: three conformed DataFrames.
  *
  *  - pathways(pathway_id: long, identifier: string, name: string)
  *  - proteins(protein_id: long, hgnc_id: string, hgnc_symbol: string)
  *  - membership(pathway_id: long, protein_id: long)   // M:N
  *
  * Mirrors the reference's ComPath schema contract (reference
  * compath/mixins.py:21-85, sources/pid.py:217-256).
  */
final case class PathwayStore(pathways: DataFrame, proteins: DataFrame,
                              membership: DataFrame)

/** The ComPath query surface (reference compath/manager.py), re-expressed
  * set-level: every per-row ORM loop in the reference (flagged "terribly
  * inefficient" at compath/manager.py:196) becomes one declarative plan that
  * Catalyst can broadcast / push down / reorder.
  *
  * Scale notes (100 TB design point): `pathways` and `proteins` are
  * dimension-sized (≤ millions of rows) and always broadcastable;
  * `membership` is the fact table and all heavy operators below shuffle it
  * at most once, on `pathway_id`.
  */
final class PathwayQueries(val store: PathwayStore) {
  import store._

  // --- P-series: filters ---------------------------------------------------

  /** P2 (reference compath/manager.py:238-245): unique fetch with the
    * one-or-none contract — >1 match is an error, 0 matches is None. */
  def getPathwayById(identifier: String): Option[org.apache.spark.sql.Row] = {
    val rows = pathways.filter(col("identifier") === identifier).limit(2).collect()
    require(rows.length <= 1, s"multiple pathways for identifier=$identifier")
    rows.headOption
  }

  /** P3 (reference compath/manager.py:247-254): all pathways named `name`. */
  def getPathwaysByName(name: String): DataFrame =
    pathways.filter(col("name") === name)

  /** P4 (reference compath/manager.py:122-137): IN-list protein fetch.
    * For query sets beyond a few thousand symbols callers should use
    * [[proteinsBySymbolDf]] (semi-join) instead of an IN literal. */
  def proteinsByHgncSymbols(symbols: Seq[String]): DataFrame =
    proteins.filter(col("hgnc_symbol").isin(symbols: _*))

  /** Large-query variant: left-semi join against a query DataFrame. */
  def proteinsBySymbolDf(symbols: DataFrame): DataFrame =
    proteins.join(broadcast(symbols),
      proteins("hgnc_symbol") === symbols(symbols.columns.head), "left_semi")

  /** P5 (reference compath/manager.py:139-153): disjunctive substring
    * search over proteins, with LIMIT pushdown. */
  def searchProteins(q: String, limit: Int = 100): DataFrame =
    proteins.filter(col("hgnc_symbol").contains(q) || col("hgnc_id").contains(q))
      .limit(limit)

  /** P6 (reference compath/manager.py:155-169): case-insensitive pathway
    * search (ILIKE) OR identifier contains. */
  def searchPathways(q: String, limit: Int = 100): DataFrame =
    pathways.filter(
      lower(col("name")).contains(q.toLowerCase) || col("identifier").contains(q))
      .limit(limit)

  // --- J-series: joins -----------------------------------------------------

  /** J1 (reference compath/manager.py:289-301): pathway ⋈ membership ⋈
    * protein, projecting one pathway col and one protein col. The dims
    * broadcast; membership shuffles at most once. */
  def pathwayToProtein(pathwayCol: String = "identifier",
                       proteinCol: String = "hgnc_symbol"): DataFrame =
    membership
      .join(broadcast(pathways), "pathway_id")
      .join(broadcast(proteins), "protein_id")
      .filter(col(proteinCol).isNotNull)             // P7 (manager.py:294-301)
      .select(col(pathwayCol), col(proteinCol))

  // --- A-series: aggregations ---------------------------------------------

  /** A8 (reference compath/manager.py:273-292): pathway → sorted distinct
    * gene set, as an array column (deterministic order for oracles).
    * Plain one-shuffle collect_set: pathway membership is domain-bounded
    * (no pathway has more than a few thousand genes), so the hot-key
    * regime [[graft.core.Skew.saltedCollectSet]] exists for — unbounded
    * value cardinality per key — cannot occur here, and the salted form's
    * second shuffle would be pure overhead. */
  def geneSets(): DataFrame =
    pathwayToProtein().groupBy("identifier")
      .agg(sort_array(collect_set(col("hgnc_symbol"))).as("gene_set"))

  /** A9 (reference compath/manager.py:264-271): all distinct gene symbols. */
  def allHgncSymbols(): DataFrame =
    pathwayToProtein().select("hgnc_symbol").distinct()

  /** A4 (reference compath/manager.py:303-315): pathway sizes with
    * HAVING count > 0 (inner join makes the HAVING implicit; kept
    * explicit for parity). */
  def pathwaySizes(): DataFrame =
    membership.groupBy("pathway_id")
      .agg(countDistinct("protein_id").as("pathway_size"))
      .filter(col("pathway_size") > 0)

  /** A5 (reference compath/manager.py:317-333): protein degree — number of
    * pathways each protein participates in. */
  def geneDegrees(): DataFrame =
    membership.groupBy("protein_id")
      .agg(countDistinct("pathway_id").as("n_pathways"))
      .filter(col("n_pathways") > 0)

  /** A6 — the flagship enrichment query (reference
    * compath/manager.py:203-236, `query_hgnc_symbols`). The reference runs
    * an N+1 loop (one SQL query per matched pathway); here it is ONE job:
    * semi-join matched proteins into membership, aggregate per pathway,
    * join pathway sizes. Returns
    * (pathway_id, identifier, name, mapped_proteins, pathway_size). */
  def enrich(symbols: Seq[String]): DataFrame = {
    val matched = proteinsByHgncSymbols(symbols).select("protein_id")
    val perPathway = membership
      .join(broadcast(matched), "protein_id")
      .groupBy("pathway_id")
      .agg(countDistinct("protein_id").as("mapped_proteins"))
    // The reference returns the full gene set per matched pathway
    // (compath/manager.py:228-234) — joined in as a sorted array so the
    // result is deterministic and oracle-checkable.
    val sets = membership
      .join(broadcast(proteins), "protein_id")
      .groupBy("pathway_id")
      .agg(sort_array(collect_set(col("hgnc_symbol"))).as("gene_set"),
        countDistinct("protein_id").as("pathway_size"))
      .filter(col("pathway_size") > 0)
    perPathway
      .join(sets, "pathway_id")
      .join(broadcast(pathways), "pathway_id")
      .select(col("pathway_id"), col("identifier"), col("name"),
        col("mapped_proteins"), col("pathway_size"), col("gene_set"))
  }

  // --- G7: BEL export ------------------------------------------------------

  /** partOf edge build shared by [[toBelEdges]] and the J5/J6 graph
    * enrichers: `pathwaySubset` must carry (pathway_id, identifier). */
  private def partOfEdges(pathwaySubset: DataFrame,
                          namespace: String): DataFrame =
    membership
      .join(broadcast(pathwaySubset), "pathway_id")
      .join(broadcast(proteins), "protein_id")
      .filter(col("hgnc_symbol").isNotNull) // null-skip: compath/mixins.py:35-41
      .select(
        concat(lit("hgnc:"), col("hgnc_symbol")).as("src"),
        lit("partOf").as("relation"),
        concat(lit(s"$namespace:"), col("identifier")).as("dst"))
      .distinct()

  /** G7 (reference compath/mixins.py:48-62, manager.py:384-394): one
    * `partOf` edge per (protein, pathway) membership row. */
  def toBelEdges(namespace: String): DataFrame =
    partOfEdges(pathways, namespace)

  /** J5 (reference compath/manager.py:396-409, `enrich_pathways`): for
    * every pathway NODE already present in the graph — a node whose
    * namespace is this module's and whose identifier is non-null — add the
    * pathway's full membership as partOf edges. `graphNodes` columns:
    * (namespace, identifier); extra columns ignored. The node set is
    * dimension-sized (it came out of a graph), so both the identifier
    * semi-join and the pathway dim broadcast. */
  def enrichPathways(graphNodes: DataFrame, namespace: String): DataFrame = {
    val wanted = graphNodes
      .filter(lower(col("namespace")) === namespace.toLowerCase
        && col("identifier").isNotNull)
      .select("identifier").distinct()
    partOfEdges(
      pathways.join(broadcast(wanted), Seq("identifier"), "left_semi"),
      namespace)
  }

  /** J6 (reference compath/manager.py:411-419, `enrich_proteins`): find
    * every pathway containing at least one of the graph's HGNC proteins,
    * then add each such pathway's FULL membership (not just the matched
    * proteins) as partOf edges — the reference adds the whole pathway via
    * `add_to_bel_graph`. `graphHgncIds`: one column of hgnc ids. */
  def enrichProteins(graphHgncIds: DataFrame, namespace: String): DataFrame = {
    val ids = graphHgncIds
      .select(col(graphHgncIds.columns.head).as("hgnc_id")).distinct()
    val matched = proteins
      .join(broadcast(ids), Seq("hgnc_id"), "left_semi")
      .select("protein_id")
    val hitPathways = membership
      .join(broadcast(matched), "protein_id")
      .select("pathway_id").distinct()
    partOfEdges(
      pathways.join(hitPathways, Seq("pathway_id"), "left_semi"),
      namespace)
  }
}
