package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bel.Terms

/** PID NDEx CX source (S14 + G4 + J8; reference sources/pid.py:66-206).
  *
  * CX aspects arrive prestaged as DataFrames keyed by internal ids
  * (`spark.read.json` per aspect — SURVEY S14):
  *   nodes(node_id, reference, label)
  *   nodeAttributes(po, name, value_str, value_list)
  *   edges(edge_id, s, t, interaction)
  *   edgeAttributes(po, name, value_list)
  *
  * G4's `product(sources, targets, citations)` becomes three explodes
  * (family-member expansion on both endpoints × per-edge citations) —
  * generator shapes, not loops. */
object Pid {

  /** Curated family mapping (pid.py:49-63 MAPPING) as literal rows:
    * reference → (namespace, name). */
  val curated: Seq[(String, String, String)] = Seq(
    ("RAS Family", "fplx", "RAS"),
    ("Cyclin D", "fplx", "Cyclin_D"),
    ("Gi family", "fplx", "G_i"))

  /** J8 node resolution (pid.py:108-160): each CX node becomes an ARRAY
    * of member terms — singleton for plain nodes, n members for protein
    * families, empty (dropped) for unmapped. `hgncNameToId` columns:
    * (hgnc_symbol, hgnc_id); `chebiNames`: (chebi_id, name). */
  def resolveNodes(nodes: DataFrame, nodeAttributes: DataFrame,
                   hgncNameToId: DataFrame, chebiNames: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val types = nodeAttributes.filter(col("name") === "type")
      .select(col("po").as("node_id"), col("value_str").as("node_type"))
    val members = nodeAttributes.filter(col("name") === "member")
      .select(col("po").as("node_id"), col("value_list").as("members"))
    val curatedDim = curated.toDF("ref_key", "cur_ns", "cur_name")

    val base = nodes
      .join(types, Seq("node_id"), "left")
      .join(members, Seq("node_id"), "left")
      .join(broadcast(curatedDim), col("reference") === col("ref_key"), "left")

    // family-member expansion (pid.py:119-135): hgnc.symbol members →
    // hgnc-grounded Protein terms; unmapped members dropped
    val familyTerms = base.filter(col("members").isNotNull)
      .select(col("node_id"), explode(col("members")).as("member"))
      .filter(col("member").startsWith("hgnc.symbol:"))
      .withColumn("sym", expr("substring(member, 13)"))
      .join(broadcast(hgncNameToId.toDF("sym_key", "hgnc_id")),
        col("sym") === col("sym_key"), "inner")
      .groupBy("node_id")
      .agg(sort_array(collect_set(
        concat(lit("Protein(hgnc:"), col("hgnc_id"), lit(" ! "), col("sym"),
          lit(")")))).as("terms"))

    val prefix = substring_index(col("reference"), ":", 1)
    val identifier = expr("substring(reference, instr(reference, ':') + 1)")
    val plain = base
      .join(broadcast(chebiNames.toDF("ch_key", "ch_name")),
        prefix === "CHEBI" && identifier === col("ch_key"), "left")
      .withColumn("term",
        when(col("cur_ns").isNotNull,
          concat(lit("Protein("), col("cur_ns"), lit(":"), col("cur_name"),
            lit(")")))
          .when(prefix === "CHEBI",
            concat(lit("Abundance(chebi:"), identifier,
              when(col("ch_name").isNotNull,
                concat(lit(" ! "), col("ch_name"))).otherwise(lit("")),
              lit(")")))
          .when(prefix === "uniprot",
            concat(lit("Protein(hgnc:"), identifier, lit(" ! "),
              col("label"), lit(")")))
          // hprd/cas/no-curie → unmapped (pid.py:139-146)
          .otherwise(lit(null)))

    plain.select(col("node_id"),
        when(col("term").isNotNull, array(col("term"))).as("terms"))
      .filter(col("terms").isNotNull)
      .unionByName(familyTerms)
      .groupBy("node_id").agg(flatten(collect_list(col("terms"))).as("terms"))
  }

  /** G4 edge dispatch (pid.py:162-206) + the triple explode. */
  def toBel(edges: DataFrame, edgeAttributes: DataFrame,
            resolvedNodes: DataFrame, networkUuid: String): DataFrame = {
    // pid.py:106: citation strings arrive 'pubmed:<id>' — prefix stripped
    val citsFixed = edgeAttributes.filter(col("name") === "citation")
      .select(col("po").as("edge_id"),
        transform(col("value_list"), c => substring(c, 8, 1000000)).as("cits"))

    val rel = when(col("interaction") === "in-complex-with", "binds")
      .when(col("interaction") === "reacts-with", "binds")
      .when(col("interaction").isin("controls-phosphorylation-of",
        "controls-transport-of", "controls-transport-of-chemical",
        "chemical-affects", "controls-expression-of",
        "controls-production-of", "consumption-controlled-by",
        "controls-state-change-of", "catalysis-precedes"), "regulates")

    // resolvedNodes is the node set of ONE NDEx network — dimension-sized
    // by the domain contract (the reference holds the entire CX response
    // in memory, pid.py:66-106), so both endpoint joins broadcast: the
    // edge×citation explode side streams without a shuffle. The frame is
    // materialized ONCE first — the two broadcasts carry different
    // projections, so without the cut each would recompute the whole
    // resolve pipeline (no exchange reuse across broadcast builds).
    val rn = graft.core.Checkpoints.cut(resolvedNodes)
    val joined = edges
      .join(citsFixed, Seq("edge_id"), "left")
      .join(broadcast(rn.select(col("node_id").as("s"),
        col("terms").as("src_terms"))), Seq("s"))
      .join(broadcast(rn.select(col("node_id").as("t"),
        col("terms").as("dst_terms"))), Seq("t"))
      .withColumn("relation", rel)
      .filter(col("relation").isNotNull) // unhandled types logged+skipped
      .withColumn("citation_list",
        coalesce(col("cits"), array(lit(s"ndex:$networkUuid"))))

    // product(sources, targets, citations) — pid.py:173
    val exploded = joined
      .select(col("edge_id"), col("interaction"), col("relation"),
        explode(col("src_terms")).as("src"), col("dst_terms"),
        col("citation_list"))
      .select(col("edge_id"), col("interaction"), col("relation"),
        col("src"), explode(col("dst_terms")).as("dst"),
        col("citation_list"))
      .select(col("edge_id"), col("interaction"), col("relation"),
        col("src"), col("dst"),
        explode(col("citation_list")).as("citation"))

    // controls-phosphorylation-of adds pmod(Ph) to the target (pid.py:181)
    val withMods = exploded
      .withColumn("dst",
        when(col("interaction") === "controls-phosphorylation-of",
          regexp_replace(col("dst"), "\\)$", ", pmod(Ph))"))
          .otherwise(col("dst")))
      .withColumn("object_modifier",
        when(col("interaction") === "chemical-affects", lit("activity"))
          .otherwise(lit(null).cast("string")))

    withMods
      .select(col("src"), col("relation"), col("dst"), col("citation"),
        col("edge_id").cast("string").as("evidence"), col("object_modifier"))
      .dropDuplicates()
  }
}
