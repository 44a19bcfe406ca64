package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.bel.{Exporters, NamespaceFiles, NamespaceSpec}
import graft.compath.PathwayQueries
import graft.core.Tables
import graft.functions.Curies

/** Second batch of driver-harness registrations: the SURVEY §2 items not
  * covered by [[Queries]] — PID CX dispatch (S14+J8+G4), OBO scan (S11),
  * triples export/scan round-trip (K9+S17), circRNADisease scan shape
  * (S10), namespace manager shapes (A7, K3, J9), and the small F/O/P/A
  * items (F12, F15, O5, O6, P8, P10, P14, A10, A12, K10).
  *
  * Same conventions as [[Queries]] (aliased columns, deterministic row
  * sets, DuckDB-reproducible doubles).
  */
object MoreQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ==========================================================================
  // G4 + S14 + J8: PID NDEx CX synthetic aspects
  // ==========================================================================

  /** CX `nodes` aspect from part: 5 reference classes — curated family,
    * CHEBI, uniprot, member-expanded family, unmapped (hprd). */
  private def cxNodes(s: SparkSession, d: String): DataFrame = {
    val pk = col("p_partkey")
    t(s, d, "part").select(
      pk.as("node_id"),
      when(pmod(pk, lit(5)) === 0, lit("RAS Family"))
        .when(pmod(pk, lit(5)) === 1, concat(lit("CHEBI:"), pk))
        .when(pmod(pk, lit(5)) === 2, concat(lit("uniprot:U"), pk))
        .when(pmod(pk, lit(5)) === 3, concat(lit("pfam:F"), pk))
        .otherwise(concat(lit("hprd:"), pk)).as("reference"),
      concat(lit("L"), pk).as("label"))
  }

  private def cxNodeAttributes(s: SparkSession, d: String): DataFrame = {
    val pk = col("p_partkey")
    val members = t(s, d, "part").filter(pmod(pk, lit(5)) === 3).select(
      pk.as("po"), lit("member").as("name"),
      lit(null).cast("string").as("value_str"),
      array(concat(lit("hgnc.symbol:S"), pk),
        concat(lit("hgnc.symbol:S"), pk + 1),
        lit("x:junk")).as("value_list"))
    val types = t(s, d, "part").select(
      pk.as("po"), lit("type").as("name"), lit("protein").as("value_str"),
      lit(null).cast("array<string>").as("value_list"))
    members.unionByName(types)
  }

  /** hgnc symbol→id dim (J8 grounding input): keys S<k> for k % 3 != 0. */
  private def cxHgnc(s: SparkSession, d: String): DataFrame = {
    val pk = col("p_partkey")
    t(s, d, "part").filter(pmod(pk, lit(3)) =!= 0)
      .select(concat(lit("S"), pk).as("sym"), concat(lit("H"), pk).as("hid"))
  }

  private def cxChebi(s: SparkSession, d: String): DataFrame = {
    val pk = col("p_partkey")
    t(s, d, "part").filter(pmod(pk, lit(2)) === 0)
      .select(pk.cast("string").as("k"), concat(lit("CH"), pk).as("nm"))
  }

  /** CX `edges` aspect from lineitem; suppkeys land inside the partkey
    * space so both endpoints resolve against the same node set. */
  private def cxEdges(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("edge_id"),
      col("l_partkey").as("s"), col("l_suppkey").as("t"),
      caseOn(pmod(col("l_orderkey"), lit(4)), Seq(
        "in-complex-with", "controls-phosphorylation-of",
        "chemical-affects", "bogus-type")).as("interaction"))

  private def cxEdgeAttributes(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(pmod(col("l_orderkey"), lit(3)) === 0).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("po"),
      lit("citation").as("name"),
      array(concat(lit("pubmed:"), col("l_orderkey")),
        concat(lit("pubmed:"), col("l_orderkey") + 1)).as("value_list"))

  private def caseOn(key: org.apache.spark.sql.Column,
                     values: Seq[String]): org.apache.spark.sql.Column =
    values.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (v, i)) => when(key === i, lit(v)).otherwise(acc)
    }

  // ==========================================================================
  // S11: OBO — deterministic ontology text built from `nation`, parsed by
  // the real parser; the oracle reproduces the expected frames from the
  // same table.
  // ==========================================================================

  private def oboText(s: SparkSession, d: String): String = {
    val rows = t(s, d, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .collect()
      .sortBy(_.getInt(0))
    val stanzas = rows.map { r =>
      val k = r.getInt(0); val nm = r.getString(1); val rk = r.getInt(2)
      val obsolete = if (k % 7 == 3) "is_obsolete: true\n" else ""
      val partOf =
        if (k % 2 == 0) s"relationship: part_of GR:R$rk ! region\n" else ""
      s"[Term]\nid: GR:$k\nname: $nm\nnamespace: nation\n" +
        s"is_a: GR:R$rk ! region\n$obsolete$partOf"
    }
    "format-version: 1.2\n\n" + stanzas.mkString("\n")
  }

  // ==========================================================================
  // Registrations
  // ==========================================================================

  val queries: Map[String, Q] = Map[String, Q](
    "g4_pid_bel" -> ((s, d) =>
      graft.sources.Pid.toBel(
        cxEdges(s, d), cxEdgeAttributes(s, d),
        graft.sources.Pid.resolveNodes(cxNodes(s, d), cxNodeAttributes(s, d),
          cxHgnc(s, d), cxChebi(s, d)),
        networkUuid = "test-uuid")),

    "s11_obo_terms" -> ((s, d) => {
      val (terms, _) = graft.etl.Obo.parse(oboText(s, d))
      import s.implicits._
      terms.toDF()
    }),
    "s11_obo_edges" -> ((s, d) => {
      val (_, edges) = graft.etl.Obo.parse(oboText(s, d))
      import s.implicits._
      edges.toDF()
    }),

    // K9 + S17 round-trip: export triples TSV with the real sink, then
    // scan it back with the real 3-col reader.
    "s17_triples" -> ((s, d) => {
      val edges = t(s, d, "lineitem").select(
        concat(lit("p:"), col("l_partkey")).as("src"),
        lit("interacts").as("relation"),
        concat(lit("s:"), col("l_suppkey")).as("dst")).distinct()
      val dir = s"/tmp/graft_triples_${new java.io.File(d).getName}"
      Exporters.triples(edges, dir)
      s.read.option("sep", "\t")
        .schema("head STRING, relation STRING, tail STRING").csv(dir)
    }),

    "s10_circrna_scan" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey").as("circrna_id"),
        concat(lit("G"), col("o_custkey")).as("gene_symbol"),
        lit("human").as("species"),
        col("o_orderstatus").as("disease"),
        col("o_orderpriority").as("method"),
        concat(lit("PMID:"), col("o_orderkey")).as("pmid"),
        year(col("o_orderdate")).as("pub_year"),
        col("o_totalprice").as("expression_score"))
        .na.drop()),

    // A7: namespace incremental update — anti-join on identifier, null
    // names skipped (namespace_manager.py:272-296).
    "a7_ns_update" -> ((s, d) => {
      val sk = col("s_suppkey")
      val models = t(s, d, "supplier").select(
        concat(lit("I"), sk).as("identifier"),
        when(pmod(sk, lit(7)) === 0, lit(null).cast("string"))
          .otherwise(col("s_name")).as("name"),
        lit("GRP").as("encoding"))
      val existing = t(s, d, "supplier").filter(pmod(sk, lit(2)) === 0)
        .select(concat(lit("I"), sk).as("identifier"))
      models.join(existing, Seq("identifier"), "left_anti")
        .filter(col("name").isNotNull)
    }),

    // K3: .belns file content (header + sorted name|encoding lines), via
    // the real writer, surfaced as one row per line.
    "k3_belns_lines" -> ((s, d) => {
      val models = t(s, d, "supplier").select(
        concat(lit("I"), col("s_suppkey")).as("identifier"),
        col("s_name").as("name"), lit("GRP").as("encoding"))
      val spec = NamespaceSpec("graft", "graft", "GRAFT", "_GRAFT")
      val content = NamespaceFiles.belns(spec, models, useNames = true)
      import s.implicits._
      content.stripSuffix("\n").split("\n", -1).toSeq.toDF("line")
    }),

    // K10: gene-set TSV export shape — exploded (identifier, symbol).
    "k10_gene_sets_tsv" -> ((s, d) =>
      new PathwayQueries(Queries.pathwayStore(s, d)).geneSets()
        .select(col("identifier"),
          explode(col("gene_set")).as("hgnc_symbol"))),

    // J9: namespace-entry backref — entries filtered by namespace FK.
    "j9_ns_backref" -> ((s, d) =>
      t(s, d, "supplier")
        .select(concat(lit("_NS"), pmod(col("s_suppkey"), lit(3)))
          .as("namespace_url"),
          concat(lit("I"), col("s_suppkey")).as("identifier"),
          col("s_name").as("name"))
        .filter(col("namespace_url") === "_NS1")
        .select("identifier", "name")),

    // A10: dictionary-encode-then-ground — distinct values grounded once,
    // broadcast-joined back (hmdd.py:35-54).
    "a10_distinct_ground" -> ((s, d) => {
      val raw = t(s, d, "part").select(col("p_partkey"), col("p_brand"))
      val grounded = raw.select("p_brand").distinct()
        .withColumn("grounded", upper(col("p_brand")))
      raw.join(broadcast(grounded), "p_brand")
        .groupBy("grounded").agg(count(lit(1)).as("n"))
    }),

    // A12: dedup via dict keys.
    "a12_dict_dedup" -> ((s, d) =>
      t(s, d, "part").select(col("p_brand").as("brand"),
        col("p_type").as("ptype")).dropDuplicates()),

    // F12: filename from URL.
    "f12_name_from_url" -> ((s, d) =>
      t(s, d, "region").select(col("r_regionkey"),
        Curies.nameFromUrl(concat(lit("https://example.org/data/"),
          col("r_name"), lit(".tsv.gz"))).as("fname"))),

    // F15: display capitalization (python str.capitalize semantics).
    "f15_capitalize" -> ((s, d) => {
      val low = lower(col("n_name"))
      t(s, d, "nation").select(col("n_nationkey"),
        concat(upper(substring(low, 1, 1)), substring(low, 2, 1000000))
          .as("display"))
    }),

    // O5: sorted display with explicit position (7 rows — display op).
    "o5_sorted_display" -> ((s, d) => {
      val counts = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")
        .map(n => t(s, d, n).agg(count(lit(1)).as("n"))
          .select(lit(n).as("tbl"), col("n")))
        .reduce(_ unionByName _)
      counts.withColumn("pos", row_number().over(Window.orderBy("tbl")))
    }),

    // O6: first-row probe.
    "o6_first_row" -> ((s, d) =>
      t(s, d, "orders").orderBy("o_orderkey").limit(1)
        .select("o_orderkey", "o_orderstatus")),

    // P8: dropna after scan (rows with any null dropped).
    "p8_dropna" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status"),
        nullif(col("o_orderpriority"), lit("1-URGENT")).as("priority"))
        .na.drop()),

    // P10: post-mapping null filter (keep only grounded rows).
    "p10_postmap_null" -> ((s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")
          .filter(pmod(col("n_nationkey"), lit(2)) === 0)
          .select(col("n_nationkey").as("nk"), col("n_name").as("mapped"))),
          col("c_nationkey") === col("nk"), "left")
        .filter(col("mapped").isNotNull)
        .select("c_custkey", "mapped")),

    // P14: populated-check predicate.
    "p14_populated" -> ((s, d) =>
      t(s, d, "lineitem").agg((count(lit(1)) > 0).as("populated"))))

  // ==========================================================================
  // DuckDB oracles
  // ==========================================================================

  val oracleSql: Map[String, String] = Map(
    "g4_pid_bel" ->
      """WITH hgnc AS (
        |  SELECT 'S' || p_partkey AS sym, 'H' || p_partkey AS hid
        |  FROM part WHERE p_partkey % 3 <> 0
        |), chebi AS (
        |  SELECT CAST(p_partkey AS VARCHAR) AS k, 'CH' || p_partkey AS nm
        |  FROM part WHERE p_partkey % 2 = 0
        |), fam_m AS (
        |  SELECT p_partkey AS node_id,
        |    unnest(['S' || p_partkey, 'S' || (p_partkey + 1)]) AS m
        |  FROM part WHERE p_partkey % 5 = 3
        |), fam AS (
        |  SELECT node_id, list_sort(list(DISTINCT
        |    'Protein(hgnc:' || hid || ' ! ' || m || ')')) AS terms
        |  FROM fam_m JOIN hgnc ON m = sym GROUP BY node_id
        |), plain AS (
        |  SELECT p_partkey AS node_id,
        |    CASE
        |      WHEN p_partkey % 5 = 0 THEN ['Protein(fplx:RAS)']
        |      WHEN p_partkey % 5 = 1 THEN ['Abundance(chebi:' || p_partkey
        |        || coalesce(' ! ' || nm, '') || ')']
        |      WHEN p_partkey % 5 = 2 THEN ['Protein(hgnc:U' || p_partkey
        |        || ' ! L' || p_partkey || ')']
        |    END AS terms
        |  FROM part LEFT JOIN chebi ON CAST(p_partkey AS VARCHAR) = k
        |  WHERE p_partkey % 5 IN (0, 1, 2)
        |), terms AS (
        |  SELECT * FROM plain UNION ALL SELECT * FROM fam
        |), e AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS edge_id,
        |    l_partkey AS s, l_suppkey AS t,
        |    CASE l_orderkey % 4 WHEN 0 THEN 'in-complex-with'
        |      WHEN 1 THEN 'controls-phosphorylation-of'
        |      WHEN 2 THEN 'chemical-affects' ELSE 'bogus-type' END
        |      AS interaction,
        |    CASE WHEN l_orderkey % 3 = 0
        |      THEN [CAST(l_orderkey AS VARCHAR),
        |            CAST(l_orderkey + 1 AS VARCHAR)]
        |      ELSE ['ndex:test-uuid'] END AS cits
        |  FROM lineitem
        |), joined AS (
        |  SELECT e.edge_id, e.interaction,
        |    CASE WHEN e.interaction = 'in-complex-with' THEN 'binds'
        |         ELSE 'regulates' END AS relation,
        |    st.terms AS src_terms, tt.terms AS dst_terms, e.cits
        |  FROM e
        |  JOIN terms st ON e.s = st.node_id
        |  JOIN terms tt ON e.t = tt.node_id
        |  WHERE e.interaction <> 'bogus-type'
        |), ex1 AS (
        |  SELECT edge_id, interaction, relation, unnest(src_terms) AS src,
        |    dst_terms, cits FROM joined
        |), ex2 AS (
        |  SELECT edge_id, interaction, relation, src,
        |    unnest(dst_terms) AS dst, cits FROM ex1
        |), ex3 AS (
        |  SELECT edge_id, interaction, relation, src, dst,
        |    unnest(cits) AS citation FROM ex2
        |)
        |SELECT DISTINCT src, relation,
        |  CASE WHEN interaction = 'controls-phosphorylation-of'
        |    THEN regexp_replace(dst, '\)$', ', pmod(Ph))') ELSE dst END
        |    AS dst,
        |  citation, CAST(edge_id AS VARCHAR) AS evidence,
        |  CASE WHEN interaction = 'chemical-affects' THEN 'activity' END
        |    AS object_modifier
        |FROM ex3
        |""".stripMargin,

    "s11_obo_terms" ->
      ("SELECT 'GR:' || n_nationkey AS term_id, n_name AS name, " +
        "'nation' AS namespace, n_nationkey % 7 = 3 AS obsolete FROM nation"),
    "s11_obo_edges" ->
      ("SELECT 'GR:' || n_nationkey AS child_id, 'is_a' AS relation, " +
        "'GR:R' || n_regionkey AS parent_id FROM nation " +
        "UNION ALL " +
        "SELECT 'GR:' || n_nationkey, 'part_of', 'GR:R' || n_regionkey " +
        "FROM nation WHERE n_nationkey % 2 = 0"),

    "s17_triples" ->
      ("SELECT DISTINCT 'p:' || l_partkey AS head, " +
        "'interacts' AS relation, 's:' || l_suppkey AS tail FROM lineitem"),

    "s10_circrna_scan" ->
      ("SELECT o_orderkey AS circrna_id, 'G' || o_custkey AS gene_symbol, " +
        "'human' AS species, o_orderstatus AS disease, " +
        "o_orderpriority AS method, 'PMID:' || o_orderkey AS pmid, " +
        "CAST(year(o_orderdate) AS INT) AS pub_year, " +
        "o_totalprice AS expression_score FROM orders"),

    "a7_ns_update" ->
      ("SELECT 'I' || s_suppkey AS identifier, s_name AS name, " +
        "'GRP' AS encoding FROM supplier " +
        "WHERE s_suppkey % 2 <> 0 AND s_suppkey % 7 <> 0"),

    "k3_belns_lines" ->
      ("SELECT unnest(['[Namespace]', 'Keyword=GRAFT', 'NameString=graft', " +
        "'QueryValueURL=_GRAFT', '', '[Values]']) AS line " +
        "UNION ALL SELECT s_name || '|GRP' FROM supplier"),

    "k10_gene_sets_tsv" ->
      ("SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS identifier, " +
        "s_name AS hgnc_symbol FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey"),

    "j9_ns_backref" ->
      ("SELECT 'I' || s_suppkey AS identifier, s_name AS name " +
        "FROM supplier WHERE s_suppkey % 3 = 1"),

    "a10_distinct_ground" ->
      ("SELECT upper(p_brand) AS grounded, count(*) AS n FROM part " +
        "GROUP BY 1"),

    "a12_dict_dedup" ->
      "SELECT DISTINCT p_brand AS brand, p_type AS ptype FROM part",

    "f12_name_from_url" ->
      ("SELECT r_regionkey, r_name || '.tsv.gz' AS fname FROM region"),

    "f15_capitalize" ->
      ("SELECT n_nationkey, upper(substr(lower(n_name), 1, 1)) || " +
        "substr(lower(n_name), 2) AS display FROM nation"),

    "o5_sorted_display" ->
      ("SELECT tbl, n, CAST(row_number() OVER (ORDER BY tbl) AS INT) " +
        "AS pos FROM (" +
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem")
          .map(n => s"SELECT '$n' AS tbl, count(*) AS n FROM $n")
          .mkString(" UNION ALL ") + ")"),

    "o6_first_row" ->
      ("SELECT o_orderkey, o_orderstatus FROM orders " +
        "ORDER BY o_orderkey LIMIT 1"),

    "p8_dropna" ->
      ("SELECT o_orderkey, o_orderstatus AS status, " +
        "o_orderpriority AS priority FROM orders " +
        "WHERE o_orderstatus <> 'P' AND o_orderpriority <> '1-URGENT'"),

    "p10_postmap_null" ->
      ("SELECT c_custkey, n_name AS mapped FROM customer " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE n_nationkey % 2 = 0"),

    "p14_populated" ->
      "SELECT count(*) > 0 AS populated FROM lineitem")
}
