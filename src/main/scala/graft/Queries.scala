package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bel.{ConnectedComponents, Graph}
import graft.compath.{PathwayQueries, PathwayStore}
import graft.core.Tables
import graft.functions.Curies
import graft.ops.{Dedup, Similarity, TextAnalysis}
import graft.sources.{Biogrid, Go, Intact, Tfregulons}

/** The driver-harness query registry: one entry per implemented operator
  * from SURVEY.md §2 (+ the LLM-pipeline operators), each shaped over the
  * `/root/testdata/sf*` tables with a DuckDB-equivalent oracle.
  *
  * Conventions (driver contract):
  *  - every computed column is aliased identically in the Spark plan and
  *    the oracle SQL (the driver sorts columns by name before hashing);
  *  - row order is irrelevant (driver sorts rows), but LIMIT-style queries
  *    order on a unique key first so the *row set* is deterministic;
  *  - doubles appear only where both engines produce bit-identical values:
  *    exact integer-valued sums, min/max, single divisions of exact longs,
  *    or sums of 2-decimal values rounded back to 2 decimals;
  *  - timestamps are exported as formatted strings.
  */
object Queries {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The ComPath store conformed over the TPC-H-ish tables:
    * pathways ≙ part, proteins ≙ supplier, membership ≙ lineitem — a
    * genuine M:N (each part ships from many suppliers and vice versa). */
  def pathwayStore(s: SparkSession, dir: String): PathwayStore = PathwayStore(
    pathways = t(s, dir, "part").select(
      col("p_partkey").as("pathway_id"),
      col("p_partkey").cast("string").as("identifier"),
      col("p_name").as("name")),
    proteins = t(s, dir, "supplier").select(
      col("s_suppkey").as("protein_id"),
      concat(lit("HGNC:"), col("s_suppkey")).as("hgnc_id"),
      col("s_name").as("hgnc_symbol")),
    membership = t(s, dir, "lineitem").select(
      col("l_partkey").as("pathway_id"),
      col("l_suppkey").as("protein_id")))

  private def pq(s: SparkSession, dir: String) =
    new PathwayQueries(pathwayStore(s, dir))

  /** Flagship enrichment symbol set (supplier names; deterministic). */
  val enrichSymbols: Seq[String] =
    Seq(3, 7, 11, 19, 23, 42, 57, 64, 88, 91).map(i => f"Supplier#$i%09d")
  private val enrichSymbolsSql = enrichSymbols.map(x => s"'$x'").mkString(", ")

  /** BEL-style qualified edge set derived from lineitem: one edge per
    * (part, supplier) interaction with a synthetic citation and a
    * one-entry annotations map. */
  private def belEdges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      concat(lit("p:"), col("l_partkey")).as("src"),
      concat(lit("s:"), col("l_suppkey")).as("dst"),
      lit("interacts").as("relation"),
      concat(lit("pubmed:"), pmod(col("l_orderkey"), lit(1000))).as("citation"),
      lit(null).cast("string").as("evidence"),
      map(lit("flag"), col("l_returnflag")).as("annotations"))

  // ==========================================================================
  // Synthetic source inputs for the ETL/dispatch pipelines (G1-G3):
  // deterministic MITAB/CSV frames derived from the sf tables, with the
  // grounding dims derived by modular rules both sides can reproduce.
  // ==========================================================================

  private def mi(id: String, label: String) = s"""psi-mi:"MI:$id"($label)"""

  /** 14 interaction types covering every G1 dispatch class, indexed by
    * l_orderkey % 14 (12 = omit-list, 13 = unknown/reject). */
  private val g1Relations: Seq[String] = Seq(
    mi("0217", "phosphorylation reaction"),
    mi("0883", "gtpase reaction"),
    mi("0701", "dna strand elongation"),
    mi("0572", "dna cleavage"),
    mi("0902", "rna cleavage"),
    mi("0570", "protein cleavage"),
    mi("1355", "lipid cleavage"),
    mi("0199", "deformylation reaction"),
    mi("0197", "deacetylation reaction"),
    mi("0915", "physical association"),
    mi("0407", "direct interaction"),
    mi("0195", "covalent binding"),
    mi("1110", "predicted interaction"),
    mi("9999", "bogus"))

  private def caseOn(key: Column, values: Seq[String]): Column =
    values.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (v, i)) => when(key === i, lit(v)).otherwise(acc)
    }

  private[graft] def intactSynthRaw(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(
        when(pmod(col("l_partkey"), lit(7)) === 0,
          concat(lit("uniprotkb:P"), col("l_partkey")))
          .when(pmod(col("l_partkey"), lit(7)) === 1,
            concat(lit("chebi:\"CHEBI:"), col("l_partkey"), lit("\"")))
          .when(pmod(col("l_partkey"), lit(7)) === 2,
            concat(lit("chembl target:CHEMBL"), col("l_partkey"), lit("x")))
          .when(pmod(col("l_partkey"), lit(7)) === 3,
            concat(lit("intact:I"), col("l_partkey")))
          .when(pmod(col("l_partkey"), lit(7)) === 4,
            concat(lit("intenz:EC"), col("l_partkey")))
          .when(pmod(col("l_partkey"), lit(7)) === 5,
            concat(lit("intact:EBI-"), col("l_partkey")))
          .otherwise(concat(lit("genbank:X"), col("l_partkey")))
          .as("interactor_a"),
        concat(lit("uniprotkb:Q"), col("l_suppkey")).as("interactor_b"),
        caseOn(pmod(col("l_orderkey"), lit(14)), g1Relations)
          .as("interaction_type"),
        when(pmod(col("l_orderkey"), lit(3)) === 0,
          concat(lit("imex:IM-1|pubmed:"), col("l_orderkey")))
          .when(pmod(col("l_orderkey"), lit(3)) === 1,
            concat(lit("pubmed:"), col("l_orderkey")))
          .otherwise(lit("doi:x")).as("publication"),
        when(pmod(col("l_linenumber"), lit(13)) === 0,
          lit(null).cast("string"))
          .otherwise(lit(mi("0018", "two hybrid"))).as("detection_method"),
        lit(mi("0469", "intact")).as("source_database"),
        concat(lit("intact-miscore:0."), pmod(col("l_orderkey"), lit(100)))
          .as("confidence"))

  private[graft] def intactSynthMappings(s: SparkSession,
                                         d: String): Intact.Mappings = {
    val part = t(s, d, "part"); val supp = t(s, d, "supplier")
    val pU2e = part.filter(pmod(col("p_partkey"), lit(3)) =!= 0)
      .select(concat(lit("P"), col("p_partkey")).as("u"),
        (col("p_partkey") + 100000).cast("string").as("e"))
    val sU2e = supp.filter(pmod(col("s_suppkey"), lit(4)) =!= 0)
      .select(concat(lit("Q"), col("s_suppkey")).as("u"),
        (col("s_suppkey") + 200000).cast("string").as("e"))
    val pMn = part.select(concat(lit("P"), col("p_partkey")).as("u"),
      concat(lit("MNE_P"), col("p_partkey")).as("m"))
    val sMn = supp.select(concat(lit("Q"), col("s_suppkey")).as("u"),
      concat(lit("MNE_Q"), col("s_suppkey")).as("m"))
    val names = pU2e.select(col("e"), concat(lit("G"), col("e")).as("nm"))
      .unionByName(sU2e.select(col("e"), concat(lit("G"), col("e")).as("nm")))
    Intact.Mappings(
      uniprotToEntrez = pU2e.unionByName(sU2e),
      uniprotMnemonic = pMn.unionByName(sMn),
      ncbigeneNames = names,
      chebiNames = part.filter(pmod(col("p_partkey"), lit(2)) === 0)
        .select(col("p_partkey").cast("string").as("c"),
          concat(lit("CHEB_"), col("p_partkey")).as("nm")),
      complexportal = part.filter(pmod(col("p_partkey"), lit(2)) === 1)
        .select(concat(lit("I"), col("p_partkey")).as("i"),
          concat(lit("CPX-"), col("p_partkey")).as("cp")),
      reactome = part.filter(pmod(col("p_partkey"), lit(4)) === 2)
        .select(concat(lit("I"), col("p_partkey")).as("i"),
          concat(lit("R-"), col("p_partkey")).as("r")))
  }

  /** The g1 trio (bel / rejects / unhandled tally) shares ONE materialized
    * cut of the processed IntAct frame per (session, sf dir): the r3 bench
    * spent ~2/3 of the trio's ~24 s re-running the synth + grounding
    * pipeline once per registration. The memo key is identity-safe (a new
    * session gets a fresh cut; localCheckpoint blocks die with the
    * session). Harness-level concern only — library users hold their own
    * frames. */
  private val intactCutMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      DataFrame]()

  private[graft] def intactProcessedCut(s: SparkSession,
                                        d: String): DataFrame =
    intactCutMemo.computeIfAbsent((s, d), { case (ss, dir) =>
      graft.core.Checkpoints.cut(
        Intact.processed(intactSynthRaw(ss, dir),
          intactSynthMappings(ss, dir)))
    })

  private val g1OutCols: Seq[String] = Seq(
    "src_function", "src_namespace", "src_identifier", "src_name",
    "relation", "dst_function", "dst_namespace", "dst_identifier",
    "dst_name", "v_kind", "v_ns", "v_id", "v_name", "citation", "evidence",
    "subj_name", "obj_kind", "psi_mi", "detection", "score")

  // ==========================================================================
  // Spark-side query plans
  // ==========================================================================

  val queries: Map[String, Q] = Map[String, Q](
    // --- P-series: projections / filters -----------------------------------
    "p1_projection" -> ((s, d) =>
      t(s, d, "customer").select("c_custkey", "c_name")),
    "p2_point_lookup" -> ((s, d) =>
      t(s, d, "region").filter(col("r_regionkey") === 2).select("r_name")),
    "p3_eq_filter" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderstatus") === "P")
        .select("o_orderkey", "o_custkey")),
    "p4_in_list" -> ((s, d) =>
      t(s, d, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")),
    "p5_substring_or" -> ((s, d) =>
      t(s, d, "part")
        .filter(col("p_name").contains("ring") || col("p_brand").contains("#1"))
        .select("p_partkey", "p_name", "p_brand")),
    "p6_ci_search" -> ((s, d) =>
      t(s, d, "part")
        .filter(lower(col("p_name")).contains("ring") ||
          col("p_type").contains("ECO"))
        .select("p_partkey", "p_name", "p_type")),
    "p7_notnull" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderdate").isNotNull)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))),
    "p9_anti_membership" -> ((s, d) =>
      t(s, d, "part").filter(!col("p_type").isin("PROMO", "ECONOMY"))
        .select("p_partkey", "p_type")),
    "p11_substr_exclusion" -> ((s, d) =>
      t(s, d, "part").filter(!col("p_name").contains("box"))
        .select("p_partkey", "p_name")),
    "p12_class_filter" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")),
    "p13_prefix_filter" -> ((s, d) =>
      t(s, d, "customer")
        .filter(col("c_name").startsWith("Customer#00000001") &&
          col("c_nationkey") === 9)
        .select("c_custkey", "c_name")),

    // --- J-series: joins ---------------------------------------------------
    "j1_pathway_protein" -> ((s, d) =>
      pq(s, d).pathwayToProtein("name", "hgnc_symbol")
        .toDF("pathway", "protein")),
    "j3_broadcast_lookup" -> ((s, d) =>
      t(s, d, "orders").alias("o")
        .join(broadcast(t(s, d, "customer").alias("c")),
          col("o.o_custkey") === col("c.c_custkey"), "left")
        .select(col("o_orderkey"), col("c_mktsegment"))),
    "j4_semi_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),
    "j5_anti_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),
    "j7_edge_index" -> ((s, d) => {
      val edges = t(s, d, "lineitem").select(
        concat(lit("p:"), col("l_partkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst")).distinct()
      Graph.indexedEdgeList(edges)._2
    }),
    "o4_node_index" -> ((s, d) => {
      val edges = t(s, d, "lineitem").select(
        concat(lit("p:"), col("l_partkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
      Graph.indexedEdgeList(edges)._1
    }),

    // --- A-series: aggregations --------------------------------------------
    "a1_count" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))),
    "a2_summarize" -> ((s, d) =>
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem")
        .map(n => t(s, d, n).agg(count(lit(1)).as("n"))
          .select(lit(n).as("tbl"), col("n")))
        .reduce(_ unionByName _)),
    "a3_relation_count" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))
        .unionByName(t(s, d, "orders").agg(count(lit(1)).as("n")))
        .agg(sum("n").as("n_edges"))),
    "a4_sizes_having" -> ((s, d) =>
      pq(s, d).pathwaySizes().filter(col("pathway_size") > 3)),
    "a5_degrees" -> ((s, d) => pq(s, d).geneDegrees()),
    // gene_set is surfaced as a comma-joined string: the computation is the
    // array plan (PathwayQueries.enrich), but the driver's pandas comparator
    // cannot hash array cells, so the oracle-facing form is scalar.
    "a6_enrich" -> ((s, d) =>
      pq(s, d).enrich(enrichSymbols)
        .withColumn("gene_set", concat_ws(",", col("gene_set")))),
    "a8_gene_sets" -> ((s, d) =>
      pq(s, d).geneSets()
        .withColumn("gene_set", concat_ws(",", col("gene_set")))),
    "a9_distinct_symbols" -> ((s, d) => pq(s, d).allHgncSymbols()),
    "a13_graph_stats" -> ((s, d) =>
      Graph.stats(belEdges(s, d), withComponents = true)),
    "a13_components" -> ((s, d) => {
      // Component labels are internal hashes; canonicalize to the min node
      // string per component so the oracle can reproduce them.
      val edges = t(s, d, "supplier").select(
        concat(lit("s:"), col("s_suppkey")).as("src"),
        concat(lit("n:"), col("s_nationkey")).as("dst"))
      val cc = ConnectedComponents.run(edges)
      val canon = cc.groupBy("component").agg(min("node").as("comp"))
      cc.join(canon, "component").select("node", "comp")
    }),
    "a14_content_hash" -> ((s, d) =>
      t(s, d, "supplier")
        .agg(md5(concat_ws("|",
          sort_array(collect_list(concat(col("s_name"), lit(":"),
            col("s_nationkey")))))).as("ns_hash"))),
    // --- G1-G3: source ETL + relation dispatch over synthetic inputs -------
    "g1_intact_bel" -> ((s, d) => {
      val (edges, _) = Intact.toBel(intactProcessedCut(s, d))
      edges.select(
        col("src_function"), col("src_namespace"), col("src_identifier"),
        col("src_name"), col("relation"), col("dst_function"),
        col("dst_namespace"), col("dst_identifier"), col("dst_name"),
        element_at(col("dst_variants"), 1).getField("kind").as("v_kind"),
        element_at(col("dst_variants"), 1).getField("namespace").as("v_ns"),
        element_at(col("dst_variants"), 1).getField("identifier").as("v_id"),
        element_at(col("dst_variants"), 1).getField("name").as("v_name"),
        col("citation"), col("evidence"),
        col("subject_modifier").getField("name").as("subj_name"),
        col("object_modifier").getField("kind").as("obj_kind"),
        element_at(col("annotations"), "psi-mi").as("psi_mi"),
        element_at(col("annotations"), "intact-detection").as("detection"),
        element_at(col("annotations"), "intact-confidence").as("score"))
    }),
    "g1_intact_rejects" -> ((s, d) => {
      val (_, rejects) = Intact.toBel(intactProcessedCut(s, d))
      rejects.agg(count(lit(1)).as("n_rejects"))
    }),
    "g1_unhandled_tally" -> ((s, d) =>
      Intact.unhandledTally(intactSynthRaw(s, d))),
    "g2_biogrid_bel" -> ((s, d) => {
      val raw = t(s, d, "orders").select(
        when(pmod(col("o_custkey"), lit(4)) === 0,
          concat(lit("ncbigene:"), col("o_custkey")))
          .when(pmod(col("o_custkey"), lit(4)) === 1,
            concat(lit("biogrid:"), col("o_custkey")))
          .when(pmod(col("o_custkey"), lit(4)) === 2, lit("uniprot:P0DTD2"))
          .otherwise(concat(lit("uniprot:QX"), col("o_custkey")))
          .as("interactor_a"),
        concat(lit("ncbigene:"), col("o_orderkey")).as("interactor_b"),
        caseOn(pmod(col("o_orderkey"), lit(3)), Seq(
          mi("0794", "synthetic genetic interaction defined by inequality"),
          mi("0915", "physical association"),
          mi("0407", "direct interaction"))).as("interaction_type"),
        concat(lit("pubmed:"), col("o_orderkey") + 10).as("publication"),
        lit("m").as("detection_method"), lit("biogrid").as("source_database"),
        lit("sc").as("confidence"))
      val mappings = Biogrid.Mappings(
        t(s, d, "customer").filter(pmod(col("c_custkey"), lit(3)) =!= 0)
          .select(col("c_custkey").cast("string").as("b"),
            (col("c_custkey") + 7000000).cast("string").as("n")))
      Biogrid.toBel(Biogrid.processed(raw, mappings)).select(
        "src_function", "src_identifier", "relation", "dst_identifier",
        "citation", "src", "dst")
    }),
    "g3_tfregulons_bel" -> ((s, d) => {
      val raw = t(s, d, "lineitem").select(
        concat(lit("TF"), col("l_suppkey")).as("tf_hgnc_symbol"),
        concat(lit("TG"), col("l_partkey")).as("target_hgnc_symbol"),
        (pmod(col("l_orderkey"), lit(3)) - 1).cast("int").as("effect"),
        caseOn(pmod(col("l_orderkey"), lit(5)),
          Seq("A", "B", "C", "D", "E")).as("score"),
        concat(col("l_orderkey"), lit(","), col("l_orderkey") + 1)
          .as("pmids"))
      val hgnc = t(s, d, "supplier")
        .filter(pmod(col("s_suppkey"), lit(10)) =!= 7)
        .select(concat(lit("TF"), col("s_suppkey")).as("sym"),
          concat(lit("H"), col("s_suppkey")).as("id"))
        .unionByName(t(s, d, "part")
          .filter(pmod(col("p_partkey"), lit(5)) =!= 0)
          .select(concat(lit("TG"), col("p_partkey")).as("sym"),
            concat(lit("HP"), col("p_partkey")).as("id")))
      Tfregulons.toBel(Tfregulons.processed(raw, hgnc))
        .select("src", "relation", "dst", "citation", "evidence")
    }),
    "g6_go_assoc" -> ((s, d) => {
      val assoc = t(s, d, "customer").select(
        when(pmod(col("c_custkey"), lit(3)) === 2,
          concat(lit("MGI:"), col("c_custkey")))
          .otherwise(concat(lit("UniProtKB:P"), col("c_custkey")))
          .as("source_id"),
        col("c_name").as("source_name"),
        when(pmod(col("c_custkey"), lit(2)) === 0, "9606")
          .otherwise("10090").as("taxonomy_id"),
        concat(lit("GO:"), pmod(col("c_custkey"), lit(40))).as("target_id"),
        lit("lbl").as("target_label"), lit(false).as("negated"))
      val u2h = t(s, d, "customer")
        .filter(pmod(col("c_custkey"), lit(5)) =!= 0)
        .select(concat(lit("P"), col("c_custkey")).as("u"),
          concat(lit("H"), col("c_custkey")).as("h"))
      val h2n = t(s, d, "customer")
        .select(concat(lit("H"), col("c_custkey")).as("h"),
          concat(lit("N"), col("c_custkey")).as("n"))
      val goNames = s.range(0, 40).filter(pmod(col("id"), lit(2)) === 0)
        .select(col("id").cast("string").as("g"),
          concat(lit("GOTERM_"), col("id")).as("nm"))
      Go.toBel(Go.processed(assoc, u2h, h2n), goNames)
        .select("src", "relation", "dst", "citation")
    }),
    "f8_hmdd_ground" -> ((s, d) => {
      val raw = t(s, d, "part").select(
        when(pmod(col("p_partkey"), lit(4)) === 0,
          concat(lit("d "), col("p_partkey")))
          .when(pmod(col("p_partkey"), lit(4)) === 1,
            concat(col("p_partkey"), lit(", d")))
          .when(pmod(col("p_partkey"), lit(4)) === 2,
            concat(col("p_partkey"), lit(", b, c")))
          .otherwise(concat(lit("unknown"), col("p_partkey")))
          .as("disease"))
      val dict = t(s, d, "part")
        .filter(pmod(col("p_partkey"), lit(3)) =!= 0)
        .select(concat(lit("d "), col("p_partkey")).as("name"),
          lit("mondo").as("prefix"),
          col("p_partkey").cast("string").as("identifier"),
          concat(lit("L"), col("p_partkey")).as("label"))
        .unionByName(t(s, d, "part")
          .filter(pmod(col("p_partkey"), lit(4)) === 2)
          .select(concat(lit("c b "), col("p_partkey")).as("name"),
            lit("doid").as("prefix"),
            concat(lit("R"), col("p_partkey")).as("identifier"),
            concat(lit("L2_"), col("p_partkey")).as("label")))
      graft.sources.Hmdd.groundWithRetry(raw, dict)
    }),
    "g5_rhea" -> ((s, d) => {
      val rxns = t(s, d, "orders")
        .select(pmod(col("o_orderkey"), lit(500)).cast("string")
          .as("reaction_id"))
        .distinct()
        .withColumn("equation", concat(lit("EQ_"), col("reaction_id")))
      val parts = t(s, d, "lineitem").select(
        pmod(col("l_orderkey"), lit(500)).cast("string").as("reaction_id"),
        when(pmod(col("l_linenumber"), lit(2)) === 0, "L").otherwise("R")
          .as("side"),
        concat(lit("c"), pmod(col("l_partkey"), lit(100)))
          .as("compound_name"),
        when(pmod(col("l_partkey"), lit(5)) === 0,
          lit(null).cast("string"))
          .otherwise(col("l_partkey").cast("string")).as("chebi_id"),
        when(pmod(col("l_partkey"), lit(3)) === 0,
          concat(lit("rp"), col("l_partkey")))
          .otherwise(lit(null).cast("string")).as("reactive_part"))
      graft.sources.Rhea.reactions(rxns, parts)
        .select(col("reaction_id"), col("name"),
          concat_ws("|", col("reactants")).as("reactants"),
          concat_ws("|", col("products")).as("products"))
    }),
    "g7_bel_edges" -> ((s, d) => pq(s, d).toBelEdges("graft")),
    "g8_edge_identity" -> ((s, d) =>
      Graph.dedupEdges(belEdges(s, d)).agg(count(lit(1)).as("n_edges"))),

    // --- O-series: sorts / limits ------------------------------------------
    "o1_sort_desc" -> ((s, d) =>
      Tables.events(s, d)
        .orderBy(col("ts").desc, col("event_id").asc).limit(50)
        .select(col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))),
    "o2_top1" -> ((s, d) =>
      Tables.events(s, d)
        .orderBy(col("ts").desc, col("event_id").asc).limit(1)
        .select(col("event_id"), col("event_type"))),
    "o3_limit_search" -> ((s, d) =>
      t(s, d, "part").filter(col("p_name").contains("ring"))
        .orderBy("p_partkey").limit(10)
        .select("p_partkey", "p_name")),

    // --- U1: union with provenance -----------------------------------------
    "u1_union_sources" -> ((s, d) => {
      val a = t(s, d, "lineitem").select(
        lit("lineitem").as("source"),
        concat(lit("p:"), col("l_partkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"))
      val b = t(s, d, "orders").select(
        lit("orders").as("source"),
        concat(lit("c:"), col("o_custkey")).as("src"),
        concat(lit("o:"), col("o_orderkey")).as("dst"))
      a.unionByName(b).groupBy("source").agg(count(lit(1)).as("n"))
    }),

    // --- F-series: scalar functions ----------------------------------------
    "f1_first_prefix" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        Curies.firstWithPrefix(
          concat_ws("|", col("c_mktsegment"),
            concat(lit(" pubmed:"), col("c_custkey")), col("c_name")),
          "pubmed:").as("pmid"))),
    "f2_first_id" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        Curies.firstIdWithPrefix(
          concat_ws("|", col("c_name"),
            concat(lit("intact-miscore:0."), pmod(col("c_custkey"), lit(100)))),
          "intact-miscore:").as("score"))),
    "f5_xref_list" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
          explode(Curies.xrefList(concat_ws("|",
            concat(lit("hgnc:"), col("c_custkey")),
            col("c_name"),
            concat(lit("uniprot:U"), col("c_nationkey"))))).as("x"))
        .select(col("c_custkey"), col("x.prefix").as("prefix"),
          col("x.identifier").as("identifier"))),
    "f6_pmid_strict" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          when(pmod(col("c_custkey"), lit(3)) === 0,
            concat(lit("pubmed:"), col("c_custkey")))
            .otherwise(concat(lit("doi:"), col("c_custkey"))).as("raw"))
        .filter(col("raw").startsWith("pubmed:"))
        .select(col("c_custkey"),
          Curies.stripPrefix(col("raw"), "pubmed:").as("pmid"))),
    "f7_normalize_ws" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),
    "f10_strip_prefix" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        Curies.stripPrefix(col("c_name"), "Customer#").as("stripped"))),
    "f11_identifiers_url" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey"),
        Curies.identifiersOrgUrl(lit("nation"), col("n_name")).as("url"))),

    // --- Text analysis over documents --------------------------------------
    "t_token_count" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"))),
    "t_lang_id" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),
    "t_quality" -> ((s, d) =>
      TextAnalysis.qualityMetrics(t(s, d, "documents"))
        .select("doc_id", "n_tokens", "mean_token_len", "punct_ratio",
          "stopword_ratio", "alpha_ratio")),

    // --- Dedup over documents ----------------------------------------------
    "d_exact_dedup" -> ((s, d) =>
      Dedup.exactSurvivors(t(s, d, "documents"))),
    "d_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(t(s, d, "documents"), n = 3, threshold = 0.8)),
    "d_minhash_pairs" -> ((s, d) =>
      Dedup.minHashPairs(t(s, d, "documents"), n = 3, threshold = 0.8)),
    // simHash itself is gated by Round4Queries.d_simhash_invariant
    // (perturbed-twin Hamming + distinctness, oracle-checked) — the raw
    // engine-hash dump had no oracle by construction.

    // --- Similarity over embeddings ----------------------------------------
    "s_brute_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queriesDf = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(emb, queriesDf, k = 4)
        .withColumn("cosine", round(col("cosine"), 6))
    }),
    // lshTopK is gated by Round4Queries.s_lsh_recall (twin-recovery
    // recall vs brute force ≥ 0.95, oracle-checked) — the raw approximate
    // top-k had no oracle by construction.

    // --- Multimodal binary-column plumbing ---------------------------------
    "mm_metadata" -> ((s, d) =>
      graft.ops.Multimodal.metadata(
        graft.ops.Multimodal.withBinaryContent(t(s, d, "documents")))),
    "mm_frames" -> ((s, d) =>
      graft.ops.Multimodal.frameSample(
        graft.ops.Multimodal.withBinaryContent(t(s, d, "documents")),
        frameBytes = 256, maxFrames = 4)),
    // features are integer-valued; surfaced as a ';'-joined bigint string
    // (the driver's pandas comparator cannot hash array cells).
    // MIXED corpus: odd doc_ids carry utf-8 text payloads (byte-stat
    // fallback features), even doc_ids carry REAL binary-PPM blobs that
    // must route through the magic-byte dispatch to the netpbm codec —
    // the oracle recomputes the pixel-derived features arithmetically,
    // so a dispatch or decode bug on either path breaks the hash.
    "mm_features" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val textSide = graft.ops.Multimodal.withBinaryContent(
          docs.filter(col("doc_id") % 2 === 1))
        .select(col("doc_id"), col("content"))
      val ppmSide = graft.ops.Multimodal.ppmEncode(
        docs.filter(col("doc_id") % 2 === 0))
      graft.ops.Multimodal.decodeFeatures(textSide.unionByName(ppmSide))
        .select(col("doc_id"),
          concat_ws(";", transform(col("features"),
            x => x.cast("bigint").cast("string"))).as("features"))
    }),

    // --- Streaming-shaped: stateful sessionization (batch face) ------------
    "w_sessionize" -> ((s, d) =>
      graft.streaming.EventStreams.sessionizeBatch(Tables.events(s, d))
        .withColumn("session_start",
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss"))),

    // --- Events: windowed aggregation (batch shape of the stream op) -------
    "w_tumbling_hour" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum("value"), 2).as("sum_value"))))

  // ==========================================================================
  // DuckDB oracles
  // ==========================================================================

  private[graft] val normSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** Shingle CTEs shared by the dedup oracles (word 3-gram, sorted distinct
    * — mirrors TextAnalysis.wordShingles). */
  // private[graft]: Round6Queries embeds it in the contamination oracle
  private[graft] val shingleCte =
    s"""WITH norm AS (
       |  SELECT doc_id, $normSql AS t FROM documents
       |), words AS (
       |  SELECT doc_id, string_split(t, ' ') AS w FROM norm
       |), sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
       |         ELSE list_distinct(list_transform(range(len(w) - 2),
       |                i -> array_to_string(w[i+1:i+3], ' ')))
       |    END AS s
       |  FROM words
       |), ex AS (
       |  SELECT doc_id, unnest(s) AS shingle FROM sh
       |), sizes AS (
       |  SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
       |)""".stripMargin

  // private[graft]: Round4Queries embeds it in the near-dup-survivor oracle
  private[graft] val jaccardSql =
    s"""$shingleCte,
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b,
       |  CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sizes na ON na.doc_id = id_a
       |JOIN sizes nb ON nb.doc_id = id_b
       |WHERE CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE) >= 0.8
       |""".stripMargin

  /** Language-ID oracle: per-language marker scores, argmax with the same
    * tie-break as TextAnalysis.langId (higher score, then lexicographically
    * first language code — the CASE checks languages in sorted order).
    * `private[graft]`: Round4Queries embeds it as a subquery in the
    * curation-pipeline oracle. */
  private[graft] val langIdSql: String = {
    def hits(words: Seq[String]): String =
      words.map { w =>
        if (w.exists(_ > '⹿'))
          s"len(regexp_extract_all(text, '$w'))"
        else
          s"len(regexp_extract_all(text, '\\b$w\\b'))"
      }.mkString(" + ")
    val scores = TextAnalysis.langMarkers.toSeq.sortBy(_._1)
      .map { case (lang, ws) => s"${hits(ws)} AS s_$lang" }
      .mkString(",\n    ")
    val langs = TextAnalysis.langMarkers.keys.toSeq.sorted
    val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, $scores FROM documents
       |), m AS (
       |  SELECT doc_id, $best AS m, * FROM scored
       |)
       |SELECT doc_id,
       |  CASE WHEN m <= 0 THEN 'und' $cases END AS lang_pred
       |FROM m
       |""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "p1_projection" -> "SELECT c_custkey, c_name FROM customer",
    "p2_point_lookup" -> "SELECT r_name FROM region WHERE r_regionkey = 2",
    "p3_eq_filter" ->
      "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'P'",
    "p4_in_list" ->
      ("SELECT c_custkey, c_mktsegment FROM customer " +
        "WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')"),
    "p5_substring_or" ->
      ("SELECT p_partkey, p_name, p_brand FROM part " +
        "WHERE contains(p_name, 'ring') OR contains(p_brand, '#1')"),
    "p6_ci_search" ->
      ("SELECT p_partkey, p_name, p_type FROM part " +
        "WHERE contains(lower(p_name), 'ring') OR contains(p_type, 'ECO')"),
    "p7_notnull" ->
      ("SELECT o_orderstatus, count(*) AS n FROM orders " +
        "WHERE o_orderdate IS NOT NULL GROUP BY o_orderstatus"),
    "p9_anti_membership" ->
      ("SELECT p_partkey, p_type FROM part " +
        "WHERE p_type NOT IN ('PROMO', 'ECONOMY')"),
    "p11_substr_exclusion" ->
      "SELECT p_partkey, p_name FROM part WHERE NOT contains(p_name, 'box')",
    "p12_class_filter" ->
      ("SELECT o_orderkey, o_orderpriority FROM orders " +
        "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"),
    "p13_prefix_filter" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE starts_with(c_name, 'Customer#00000001') AND c_nationkey = 9"),

    "j1_pathway_protein" ->
      ("SELECT p_name AS pathway, s_name AS protein FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey " +
        "JOIN supplier ON l_suppkey = s_suppkey"),
    "j3_broadcast_lookup" ->
      ("SELECT o_orderkey, c_mktsegment FROM orders " +
        "LEFT JOIN customer ON o_custkey = c_custkey"),
    "j4_semi_join" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)"),
    "j5_anti_join" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"),
    "j7_edge_index" ->
      """WITH edges AS (
        |  SELECT DISTINCT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst
        |  FROM lineitem
        |), nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
        |), idx AS (
        |  SELECT node, row_number() OVER (ORDER BY node) - 1 AS node_index
        |  FROM nodes
        |)
        |SELECT s.node_index AS src_index, d.node_index AS dst_index
        |FROM edges JOIN idx s ON edges.src = s.node
        |JOIN idx d ON edges.dst = d.node
        |""".stripMargin,
    "o4_node_index" ->
      """WITH edges AS (
        |  SELECT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst
        |  FROM lineitem
        |), nodes AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
        |)
        |SELECT node, row_number() OVER (ORDER BY node) - 1 AS node_index
        |FROM nodes
        |""".stripMargin,

    "a1_count" -> "SELECT count(*) AS n FROM lineitem",
    "a2_summarize" ->
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem")
        .map(n => s"SELECT '$n' AS tbl, count(*) AS n FROM $n")
        .mkString(" UNION ALL "),
    // CAST: DuckDB sum() yields HUGEINT whose value-hash differs from
    // Spark's bigint even when equal.
    "a3_relation_count" ->
      ("SELECT CAST(sum(n) AS BIGINT) AS n_edges " +
        "FROM (SELECT count(*) AS n FROM lineitem " +
        "UNION ALL SELECT count(*) AS n FROM orders)"),
    "a4_sizes_having" ->
      ("SELECT l_partkey AS pathway_id, " +
        "count(DISTINCT l_suppkey) AS pathway_size FROM lineitem " +
        "GROUP BY l_partkey HAVING count(DISTINCT l_suppkey) > 3"),
    "a5_degrees" ->
      ("SELECT l_suppkey AS protein_id, " +
        "count(DISTINCT l_partkey) AS n_pathways FROM lineitem " +
        "GROUP BY l_suppkey HAVING count(DISTINCT l_partkey) > 0"),
    "a6_enrich" -> enrichOracle(asString = true),
    "a8_gene_sets" ->
      ("SELECT CAST(l_partkey AS VARCHAR) AS identifier, " +
        "array_to_string(list_sort(list(DISTINCT s_name)), ',') AS gene_set " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "GROUP BY l_partkey"),
    "a9_distinct_symbols" ->
      ("SELECT DISTINCT s_name AS hgnc_symbol FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey"),
    "a13_graph_stats" ->
      """WITH edges AS (
        |  SELECT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst,
        |         'pubmed:' || (l_orderkey % 1000) AS citation
        |  FROM lineitem
        |), und AS (
        |  SELECT DISTINCT u, v FROM (
        |    SELECT src AS u, dst AS v FROM edges
        |    UNION SELECT dst AS u, src AS v FROM edges)
        |  WHERE u <> v
        |), vertices AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
        |), cc AS (
        |  WITH RECURSIVE walk(n, comp) AS (
        |    SELECT node, node FROM vertices
        |    UNION
        |    SELECT e.v, walk.comp FROM walk JOIN und e ON walk.n = e.u
        |  )
        |  SELECT n, min(comp) AS comp FROM walk GROUP BY n
        |)
        |SELECT
        |  (SELECT count(*) FROM vertices) AS nodes,
        |  (SELECT count(*) FROM edges) AS edges,
        |  (SELECT count(DISTINCT citation) FROM edges) AS citations,
        |  (SELECT count(DISTINCT comp) FROM cc) AS components,
        |  CAST((SELECT count(*) FROM edges) AS DOUBLE) /
        |    (CAST((SELECT count(*) FROM vertices) AS DOUBLE) *
        |     (CAST((SELECT count(*) FROM vertices) AS DOUBLE) - 1))
        |    AS density
        |""".stripMargin,
    "a13_components" ->
      """WITH edges AS (
        |  SELECT 's:' || s_suppkey AS src, 'n:' || s_nationkey AS dst
        |  FROM supplier
        |), und AS (
        |  SELECT DISTINCT u, v FROM (
        |    SELECT src AS u, dst AS v FROM edges
        |    UNION SELECT dst AS u, src AS v FROM edges)
        |  WHERE u <> v
        |), vertices AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
        |), walk AS (
        |  WITH RECURSIVE walk(n, comp) AS (
        |    SELECT node, node FROM vertices
        |    UNION
        |    SELECT e.v, walk.comp FROM walk JOIN und e ON walk.n = e.u
        |  )
        |  SELECT n, comp FROM walk
        |)
        |SELECT n AS node, min(comp) AS comp FROM walk GROUP BY n
        |""".stripMargin,
    "a14_content_hash" ->
      ("SELECT md5(array_to_string(list_sort(" +
        "list(s_name || ':' || s_nationkey)), '|')) AS ns_hash FROM supplier"),
    "g1_intact_bel" ->
      s"""WITH src AS (
         |  SELECT l_partkey pk, l_suppkey sk, l_orderkey ok
         |  FROM lineitem
         |  WHERE l_linenumber % 13 <> 0 AND l_orderkey % 14 NOT IN (12, 13)
         |    AND l_partkey % 7 NOT IN (5, 6)
         |), res AS (
         |  SELECT *,
         |    CASE WHEN pk % 7 = 1 THEN 'Abundance'
         |         WHEN pk % 7 = 3 AND pk % 2 = 1 THEN 'NamedComplexAbundance'
         |         ELSE 'Protein' END AS src_function,
         |    CASE pk % 7
         |      WHEN 0 THEN CASE WHEN pk % 3 <> 0 THEN 'ncbigene'
         |                       ELSE 'uniprot' END
         |      WHEN 1 THEN 'chebi'
         |      WHEN 2 THEN 'chembl.target'
         |      WHEN 3 THEN CASE WHEN pk % 2 = 1 THEN 'complexportal'
         |                       WHEN pk % 4 = 2 THEN 'reactome'
         |                       ELSE 'intact' END
         |      WHEN 4 THEN 'eccode' END AS src_namespace,
         |    CASE pk % 7
         |      WHEN 0 THEN CASE WHEN pk % 3 <> 0
         |                       THEN CAST(pk + 100000 AS VARCHAR)
         |                       ELSE 'P' || pk END
         |      WHEN 1 THEN CAST(pk AS VARCHAR)
         |      WHEN 2 THEN 'CHEMBL' || pk
         |      WHEN 3 THEN CASE WHEN pk % 2 = 1 THEN 'CPX-' || pk
         |                       WHEN pk % 4 = 2 THEN 'R-' || pk
         |                       ELSE 'I' || pk END
         |      WHEN 4 THEN 'EC' || pk END AS src_identifier,
         |    CASE pk % 7
         |      WHEN 0 THEN CASE WHEN pk % 3 <> 0 THEN 'G' || (pk + 100000)
         |                       ELSE 'MNE_P' || pk END
         |      WHEN 1 THEN CASE WHEN pk % 2 = 0 THEN 'CHEB_' || pk END
         |      END AS src_name,
         |    CASE WHEN sk % 4 <> 0 THEN 'ncbigene' ELSE 'uniprot' END
         |      AS dst_namespace,
         |    CASE WHEN sk % 4 <> 0 THEN CAST(sk + 200000 AS VARCHAR)
         |         ELSE 'Q' || sk END AS dst_identifier0,
         |    CASE WHEN sk % 4 <> 0 THEN 'G' || (sk + 200000)
         |         ELSE 'MNE_Q' || sk END AS dst_name
         |  FROM src
         |), disp AS (
         |  SELECT *,
         |    CASE WHEN ok % 14 IN (0, 1, 2) THEN 'increases'
         |         WHEN ok % 14 = 9 THEN 'association'
         |         WHEN ok % 14 = 10 THEN 'regulates'
         |         WHEN ok % 14 = 11 THEN 'binds'
         |         ELSE 'decreases' END AS relation,
         |    CASE WHEN ok % 14 IN (2, 3) THEN 'Gene'
         |         WHEN ok % 14 = 4 THEN 'Rna'
         |         ELSE 'Protein' END AS dst_function,
         |    CASE WHEN ok % 14 IN (3, 4) THEN src_identifier
         |         ELSE dst_identifier0 END AS dst_identifier,
         |    CASE WHEN ok % 14 = 2 THEN 'gmod'
         |         WHEN ok % 14 IN (0, 1, 6, 7, 8) THEN 'pmod' END AS v_kind,
         |    CASE WHEN ok % 14 IN (0, 8) THEN 'bel'
         |         WHEN ok % 14 IN (1, 2, 6, 7) THEN 'go' END AS v_ns,
         |    CASE ok % 14 WHEN 1 THEN '0003924' WHEN 2 THEN '0022616'
         |         WHEN 6 THEN '0016042' WHEN 7 THEN '0018256' END AS v_id,
         |    CASE ok % 14 WHEN 0 THEN 'Ph' WHEN 1 THEN 'GTPase activity'
         |         WHEN 2 THEN 'DNA strand elongation'
         |         WHEN 6 THEN 'lipid catabolic process'
         |         WHEN 7 THEN 'protein formylation'
         |         WHEN 8 THEN 'Ac' END AS v_name,
         |    CASE ok % 14 WHEN 1 THEN 'GTPase activity' END AS subj_name,
         |    CASE WHEN ok % 14 = 6 THEN 'activity' END AS obj_kind,
         |    CASE ok % 14
         |      WHEN 0 THEN '${g1Relations(0)}' WHEN 1 THEN '${g1Relations(1)}'
         |      WHEN 2 THEN '${g1Relations(2)}' WHEN 3 THEN '${g1Relations(3)}'
         |      WHEN 4 THEN '${g1Relations(4)}' WHEN 5 THEN '${g1Relations(5)}'
         |      WHEN 6 THEN '${g1Relations(6)}' WHEN 7 THEN '${g1Relations(7)}'
         |      WHEN 8 THEN '${g1Relations(8)}' WHEN 9 THEN '${g1Relations(9)}'
         |      WHEN 10 THEN '${g1Relations(10)}'
         |      WHEN 11 THEN '${g1Relations(11)}' END AS psi_mi,
         |    CASE WHEN ok % 3 IN (0, 1) THEN 'pubmed:' || ok
         |         ELSE 'database:intact' END AS citation
         |  FROM res
         |)
         |SELECT DISTINCT src_function, src_namespace, src_identifier,
         |  src_name, relation, dst_function, dst_namespace, dst_identifier,
         |  dst_name, v_kind, v_ns, v_id, v_name, citation,
         |  'From IntAct' AS evidence, subj_name, obj_kind, psi_mi,
         |  'psi-mi:"MI:0018"(two hybrid)' AS detection,
         |  'intact-miscore:0.' || (ok % 100) AS score
         |FROM disp
         |""".stripMargin,
    "g1_intact_rejects" ->
      ("SELECT count(*) AS n_rejects FROM lineitem " +
        "WHERE l_linenumber % 13 <> 0 AND l_orderkey % 14 = 13 " +
        "AND l_partkey % 7 NOT IN (5, 6)"),
    "g1_unhandled_tally" ->
      ("SELECT 'genbank' AS prefix, count(*) AS n FROM lineitem " +
        "WHERE l_partkey % 7 = 6"),
    "g2_biogrid_bel" ->
      """WITH r AS (
        |  SELECT
        |    CASE o_custkey % 4
        |      WHEN 0 THEN CAST(o_custkey AS VARCHAR)
        |      WHEN 1 THEN CASE WHEN o_custkey % 3 <> 0
        |                       THEN CAST(7000000 + o_custkey AS VARCHAR) END
        |      WHEN 2 THEN '1489679' END AS src_identifier,
        |    CAST(o_orderkey AS VARCHAR) AS dst_identifier,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'Gene' ELSE 'Protein' END
        |      AS src_function,
        |    CASE WHEN o_orderkey % 3 = 2 THEN 'binds' ELSE 'association' END
        |      AS relation,
        |    substr('pubmed:' || (o_orderkey + 10), 8, 1) AS citation
        |  FROM orders
        |)
        |SELECT DISTINCT src_function, src_identifier, relation,
        |  dst_identifier, citation,
        |  src_function || '(ncbigene:' || src_identifier || ')' AS src,
        |  src_function || '(ncbigene:' || dst_identifier || ')' AS dst
        |FROM r WHERE src_identifier IS NOT NULL
        |""".stripMargin,
    "g3_tfregulons_bel" ->
      """WITH f AS (
        |  SELECT l_suppkey sk, l_partkey pk, l_orderkey ok FROM lineitem
        |  WHERE (l_orderkey % 5) IN (0, 1, 2) AND l_suppkey % 10 <> 7
        |    AND l_partkey % 5 <> 0
        |), q AS (
        |  SELECT *,
        |    'Protein(hgnc:H' || sk || ' ! TF' || sk || ')' AS tfp,
        |    'Rna(hgnc:HP' || pk || ' ! TG' || pk || ')' AS tgtr,
        |    'Gene(hgnc:HP' || pk || ' ! TG' || pk || ')' AS tgtg,
        |    CASE WHEN ok % 3 = 2 THEN 'directlyIncreases'
        |         ELSE 'directlyDecreases' END AS drel,
        |    CASE WHEN ok % 3 = 2 THEN 'increases' ELSE 'decreases' END AS irel
        |  FROM f WHERE ok % 3 <> 1
        |), c AS (
        |  SELECT *, CAST(ok AS VARCHAR) AS cit FROM q
        |  UNION ALL SELECT *, CAST(ok + 1 AS VARCHAR) AS cit FROM q
        |)
        |SELECT DISTINCT 'complex(' || tfp || ', ' || tgtg || ')' AS src,
        |  drel AS relation, tgtr AS dst, cit AS citation,
        |  'From TFregulons' AS evidence FROM c
        |UNION
        |SELECT DISTINCT tfp, irel, tgtr, cit, 'From TFregulons' FROM c
        |UNION
        |SELECT DISTINCT tgtg, 'transcribedTo', tgtr,
        |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM q
        |""".stripMargin,
    "g6_go_assoc" ->
      ("SELECT DISTINCT " +
        "'Protein(ncbigene:N' || c_custkey || ' ! ' || c_name || ')' AS src, " +
        "'association' AS relation, " +
        "'BiologicalProcess(go:' || (c_custkey % 40) || " +
        "CASE WHEN (c_custkey % 40) % 2 = 0 " +
        "THEN ' ! GOTERM_' || (c_custkey % 40) ELSE '' END || ')' AS dst, " +
        "'' AS citation FROM customer " +
        "WHERE c_custkey % 3 <> 2 AND c_custkey % 2 = 0 " +
        "AND c_custkey % 5 <> 0"),
    "f8_hmdd_ground" ->
      """WITH raw AS (
        |  SELECT p_partkey AS pk,
        |    CASE pk % 4
        |      WHEN 0 THEN 'd ' || pk
        |      WHEN 1 THEN pk || ', d'
        |      WHEN 2 THEN pk || ', b, c'
        |      ELSE 'unknown' || pk END AS raw
        |  FROM part
        |)
        |SELECT raw,
        |  CASE WHEN pk % 4 IN (0, 1) AND pk % 3 <> 0 THEN 'mondo'
        |       WHEN pk % 4 = 2 THEN 'doid' END AS prefix,
        |  CASE WHEN pk % 4 IN (0, 1) AND pk % 3 <> 0
        |         THEN CAST(pk AS VARCHAR)
        |       WHEN pk % 4 = 2 THEN 'R' || pk END AS identifier,
        |  CASE WHEN pk % 4 IN (0, 1) AND pk % 3 <> 0 THEN 'L' || pk
        |       WHEN pk % 4 = 2 THEN 'L2_' || pk END AS label
        |FROM raw
        |""".stripMargin,
    "g5_rhea" ->
      """WITH parts AS (
        |  SELECT CAST(l_orderkey % 500 AS VARCHAR) AS rid,
        |    CASE WHEN l_linenumber % 2 = 0 THEN 'L' ELSE 'R' END AS side,
        |    'c' || (l_partkey % 100) AS compound,
        |    CASE WHEN l_partkey % 5 = 0 THEN NULL
        |         ELSE CAST(l_partkey AS VARCHAR) END AS chebi,
        |    CASE WHEN l_partkey % 3 = 0 THEN 'rp' || l_partkey END AS rp
        |  FROM lineitem
        |), nodes AS (
        |  SELECT rid, side, compound,
        |    CASE WHEN chebi IS NOT NULL THEN
        |      'a(chebi:' || chebi || ' ! ' || coalesce(rp, compound) || ')'
        |    END AS node
        |  FROM parts
        |), perc AS (
        |  SELECT rid, side, min(node) AS node FROM nodes
        |  GROUP BY rid, side, compound
        |  HAVING count(DISTINCT node) = 1
        |), perr AS (
        |  SELECT rid,
        |    array_to_string(list_sort(list(node) FILTER (side = 'L')), '|')
        |      AS reactants,
        |    array_to_string(list_sort(list(node) FILTER (side = 'R')), '|')
        |      AS products
        |  FROM perc GROUP BY rid
        |), rxns AS (
        |  SELECT DISTINCT CAST(o_orderkey % 500 AS VARCHAR) AS rid
        |  FROM orders
        |)
        |SELECT rxns.rid AS reaction_id, 'EQ_' || rxns.rid AS name,
        |  coalesce(reactants, '') AS reactants,
        |  coalesce(products, '') AS products
        |FROM rxns LEFT JOIN perr ON rxns.rid = perr.rid
        |""".stripMargin,
    "g7_bel_edges" ->
      ("SELECT DISTINCT 'hgnc:' || s_name AS src, 'partOf' AS relation, " +
        "'graft:' || l_partkey AS dst FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey"),
    "g8_edge_identity" ->
      ("SELECT count(*) AS n_edges FROM (SELECT DISTINCT " +
        "'p:' || l_partkey, 's:' || l_suppkey, " +
        "'pubmed:' || (l_orderkey % 1000), l_returnflag FROM lineitem)"),

    "o1_sort_desc" ->
      ("SELECT event_id, event_type, " +
        "strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s FROM events " +
        "ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id LIMIT 50"),
    "o2_top1" ->
      ("SELECT event_id, event_type FROM events " +
        "ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id LIMIT 1"),
    "o3_limit_search" ->
      ("SELECT p_partkey, p_name FROM part WHERE contains(p_name, 'ring') " +
        "ORDER BY p_partkey LIMIT 10"),

    "u1_union_sources" ->
      ("SELECT source, count(*) AS n FROM (" +
        "SELECT 'lineitem' AS source FROM lineitem " +
        "UNION ALL SELECT 'orders' AS source FROM orders) GROUP BY source"),

    "f1_first_prefix" ->
      ("SELECT c_custkey, list_filter(list_transform(" +
        "string_split(c_mktsegment || '| pubmed:' || c_custkey || '|' || c_name, '|'), " +
        "x -> trim(x)), x -> starts_with(x, 'pubmed:'))[1] AS pmid " +
        "FROM customer"),
    "f2_first_id" ->
      ("SELECT c_custkey, regexp_replace(list_filter(list_transform(" +
        "string_split(c_name || '|intact-miscore:0.' || (c_custkey % 100), '|'), " +
        "x -> trim(x)), x -> starts_with(x, 'intact-miscore:'))[1], " +
        "'^intact-miscore:', '') AS score FROM customer"),
    "f5_xref_list" ->
      """WITH raw AS (
        |  SELECT c_custkey,
        |    'hgnc:' || c_custkey || '|' || c_name || '|uniprot:U' || c_nationkey
        |    AS xs
        |  FROM customer
        |), ex AS (
        |  SELECT c_custkey,
        |    unnest(list_filter(list_transform(string_split(xs, '|'),
        |      x -> trim(x)), x -> regexp_matches(x, '^[^:]+:'))) AS x
        |  FROM raw
        |)
        |SELECT c_custkey,
        |  regexp_extract(x, '^([^:]*):(.*)$', 1) AS prefix,
        |  regexp_extract(x, '^([^:]*):(.*)$', 2) AS identifier
        |FROM ex
        |""".stripMargin,
    "f6_pmid_strict" ->
      ("SELECT c_custkey, CAST(c_custkey AS VARCHAR) AS pmid FROM customer " +
        "WHERE c_custkey % 3 = 0"),
    "f7_normalize_ws" ->
      s"SELECT doc_id, md5($normSql) AS fp FROM documents",
    "f10_strip_prefix" ->
      ("SELECT c_custkey, CASE WHEN starts_with(c_name, 'Customer#') " +
        "THEN substr(c_name, 10) ELSE c_name END AS stripped FROM customer"),
    "f11_identifiers_url" ->
      ("SELECT n_nationkey, 'https://identifiers.org/nation:' || n_name " +
        "AS url FROM nation"),

    "t_token_count" ->
      ("SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0 ELSE " +
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, " +
        "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) " +
        "AS n_bpe FROM documents"),
    "t_lang_id" -> langIdSql,
    "t_quality" ->
      ("SELECT doc_id, n_tokens, " +
        "round(CAST(n_chars_m AS DOUBLE) / nullif(n_tokens, 0), 3) AS mean_token_len, " +
        "round(CAST(n_punct AS DOUBLE) / nullif(n_chars_m, 0), 4) AS punct_ratio, " +
        "round(CAST(n_stop AS DOUBLE) / nullif(n_tokens, 0), 4) AS stopword_ratio, " +
        "round(CAST(n_alpha AS DOUBLE) / nullif(n_chars_m, 0), 4) AS alpha_ratio " +
        "FROM (SELECT doc_id, " +
        "CASE WHEN len(trim(text)) = 0 THEN 0 ELSE " +
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens, " +
        "len(text) AS n_chars_m, " +
        "len(regexp_extract_all(text, '[\\.,;:!\\?]')) AS n_punct, " +
        "len(regexp_extract_all(text, '\\bthe\\b')) + " +
        "len(regexp_extract_all(text, '\\ba\\b')) + " +
        "len(regexp_extract_all(text, '\\bof\\b')) + " +
        "len(regexp_extract_all(text, '\\band\\b')) + " +
        "len(regexp_extract_all(text, '\\bis\\b')) AS n_stop, " +
        "len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha " +
        "FROM documents)"),

    "d_exact_dedup" ->
      (s"SELECT md5($normSql) AS fingerprint, min(doc_id) AS survivor_id, " +
        "count(*) AS n_copies FROM documents GROUP BY 1"),
    "d_jaccard_pairs" -> jaccardSql,
    "d_minhash_pairs" -> jaccardSql,

    "s_brute_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |  WHERE vec_id < 8
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |      CAST(e.embedding AS DOUBLE[])) AS cos_raw
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, id, cos_raw, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos_raw DESC, id) AS BIGINT)
        |    AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, id, round(cos_raw, 6) AS cosine FROM ranked
        |WHERE rank <= 4
        |""".stripMargin,

    "mm_metadata" ->
      ("SELECT doc_id, 'application/x-' || source AS mime, " +
        "octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5, " +
        "sha256(text) AS content_sha256, " +
        "CASE WHEN substring(text, 1, 1) = 't' THEN 't-class' " +
        "WHEN substring(text, 1, 1) = 'a' THEN 'a-class' " +
        "ELSE 'other' END AS sniffed FROM documents"),
    // NOTE: this oracle frames by CHARACTERS (DuckDB cannot substring/md5
    // BLOBs) while the operator frames the utf-8 payload by BYTES. They
    // agree because the driver corpus is pure ASCII at every sf (verified:
    // octet_length(encode(text)) == length(text) for all rows). A non-ASCII
    // corpus would need a byte-capable oracle engine.
    "mm_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    least(CAST(ceil(length(text) / 256.0) AS INT), 4) AS nf
        |  FROM documents WHERE length(text) > 0
        |), ex AS (
        |  SELECT doc_id, text, CAST(unnest(range(nf)) AS INT) AS frame_idx
        |  FROM f
        |)
        |SELECT doc_id, frame_idx,
        |  length(substring(text, frame_idx * 256 + 1, 256)) AS frame_bytes,
        |  md5(substring(text, frame_idx * 256 + 1, 256)) AS frame_md5
        |FROM ex
        |""".stripMargin,
    "mm_features" ->
      """WITH txt AS (
        |  SELECT doc_id, array_to_string([CAST(length(text) AS BIGINT),
        |    CAST(ascii(substring(text, 1, 1)) AS BIGINT),
        |    CAST(ascii(substring(text, length(text), 1)) AS BIGINT),
        |    CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)],
        |    ';') AS features
        |  FROM documents WHERE doc_id % 2 = 1
        |), dims AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 2 = 0
        |), px AS (
        |  SELECT doc_id, w, h, CAST(unnest(range(w * h)) AS BIGINT) AS k
        |  FROM dims
        |), ppm AS (
        |  SELECT doc_id, array_to_string([CAST(max(w) AS BIGINT),
        |    CAST(max(h) AS BIGINT),
        |    CAST(sum((doc_id * 31 + k * 7) % 256)
        |       + sum((doc_id * 31 + k * 7 + 53) % 256)
        |       + sum((doc_id * 31 + k * 7 + 106) % 256) AS BIGINT),
        |    CAST(max(w) * max(h) AS BIGINT)], ';') AS features
        |  FROM px GROUP BY doc_id
        |)
        |SELECT doc_id, features FROM txt
        |UNION ALL SELECT doc_id, features FROM ppm
        |""".stripMargin,
    "w_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
        |), l AS (
        |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM e
        |), m AS (
        |  SELECT *, CASE WHEN prev IS NULL OR
        |    CAST(floor(epoch(ts)) AS BIGINT) -
        |    CAST(floor(epoch(prev)) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END AS ns
        |  FROM l
        |), s AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM m
        |)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S')
        |    AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM s GROUP BY user_id, seq
        |""".stripMargin,
    "w_tumbling_hour" ->
      ("SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), " +
        "'%Y-%m-%d %H:%M:%S') AS hour, event_type, count(*) AS n, " +
        "round(sum(value), 2) AS sum_value FROM events " +
        "GROUP BY 1, 2"))

  private def enrichOracle(asString: Boolean): String = {
    val geneSet =
      if (asString)
        "array_to_string(list_sort(list(DISTINCT s_name)), ',') AS gene_set"
      else "list_sort(list(DISTINCT s_name)) AS gene_set"
    s"""WITH matched AS (
       |  SELECT s_suppkey FROM supplier WHERE s_name IN ($enrichSymbolsSql)
       |), per AS (
       |  SELECT l_partkey AS pid, count(DISTINCT l_suppkey) AS mapped_proteins
       |  FROM lineitem
       |  WHERE l_suppkey IN (SELECT s_suppkey FROM matched)
       |  GROUP BY l_partkey
       |), sets AS (
       |  SELECT l_partkey AS pid, count(DISTINCT l_suppkey) AS pathway_size,
       |    $geneSet
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY l_partkey
       |)
       |SELECT per.pid AS pathway_id, CAST(per.pid AS VARCHAR) AS identifier,
       |  p_name AS name, mapped_proteins, pathway_size, gene_set
       |FROM per
       |JOIN sets ON per.pid = sets.pid
       |JOIN part ON per.pid = p_partkey
       |""".stripMargin
  }
}
