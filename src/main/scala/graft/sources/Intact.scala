package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.bel.Terms
import graft.functions.Curies

/** IntAct MITAB pipeline (S6 + G1 + F1-F3) — the reference's largest
  * source (intact.py:513-875, 280-line `_add_row` dispatch).
  *
  * Spark-first design: the per-row if/elif dispatch becomes ONE broadcast
  * join against a relation dimension table ([[relationDim]]) carrying the
  * BEL relation, target retype, modification variant, and subject/object
  * modifiers per PSI-MI type; interactor CURIE grounding becomes left
  * joins against broadcast mapping DataFrames (the reference's pyobo /
  * protmapper dict lookups, intact.py:436-510 — zero-egress, so mappings
  * are injected). Everything stays codegen'd: no UDFs anywhere.
  *
  * Error channels (reference parity): malformed/unknown relations are
  * log-and-skip in IntAct (get_bel catches per row, intact.py:577-584) —
  * returned as a `rejects` side output, never a job failure.
  */
object Intact {

  val Evidence = "From IntAct"

  /** One row per PSI-MI interaction type (reference intact.py:231-298,
    * 318-399 and the special cases at 660-829). */
  private final case class Rel(
      psiMi: String, bel: String,
      targetFn: String = null,        // retype target (Gene/Rna); null = keep
      targetIdFromSource: Boolean = false, // dna/rna cleavage quirk :684-710
      vKind: String = null, vNs: String = null, vId: String = null,
      vName: String = null,
      subjActNs: String = null, subjActId: String = null,
      subjActName: String = null,
      objActivity: Boolean = false)

  private def mi(id: String, label: String) = s"""psi-mi:"MI:$id"($label)"""

  private val rels: Seq[Rel] = Seq(
    // --- increases with pmod (PROTEIN_INCREASES_MOD_DICT, :318-387) ------
    Rel(mi("0844", "phosphotransfer reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Ph"),
    Rel(mi("0217", "phosphorylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Ph"),
    Rel(mi("0559", "glycosylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Glyco"),
    Rel(mi("0216", "palmitoylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Palm"),
    Rel(mi("1327", "sulfurtransfer reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Sulf"),
    Rel(mi("0566", "sumoylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Sumo"),
    Rel(mi("0213", "methylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Me"),
    Rel(mi("0220", "ubiquitination reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Ub"),
    Rel(mi("0192", "acetylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Ac"),
    Rel(mi("0557", "adp ribosylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "ADPRib"),
    Rel(mi("0567", "neddylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Nedd"),
    Rel(mi("0210", "hydroxylation reaction"), "increases",
      vKind = "pmod", vNs = "bel", vName = "Hy"),
    Rel(mi("0556", "transglutamination reaction"), "increases",
      vKind = "pmod", vNs = "mi", vId = "0556",
      vName = "transglutamination reaction"),
    Rel(mi("0945", "oxidoreductase activity electron transfer reaction"),
      "increases", vKind = "pmod", vNs = "mi", vId = "0945",
      vName = "oxidoreductase activity electron transfer reaction"),
    Rel(mi("1250", "isomerase reaction"), "increases",
      vKind = "pmod", vNs = "mop", vId = "0000789", vName = "isomerization"),
    Rel(mi("1237", "proline isomerization reaction"), "increases",
      vKind = "pmod", vNs = "go", vId = "0000413",
      vName = "protein peptidyl-prolyl isomerization"),
    Rel(mi("0193", "amidation reaction"), "increases",
      vKind = "pmod", vNs = "go", vId = "0018032", vName = "protein amidation"),
    Rel(mi("1148", "ampylation reaction"), "increases",
      vKind = "pmod", vNs = "go", vId = "0018117",
      vName = "protein adenylylation"),
    Rel(mi("0214", "myristoylation reaction"), "increases",
      vKind = "pmod", vNs = "go", vId = "0018377",
      vName = "protein myristoylation"),
    Rel(mi("0211", "lipid addition"), "increases",
      vKind = "pmod", vNs = "go", vId = "0006497", vName = "protein lipidation"),
    Rel(mi("1143", "aminoacylation reaction"), "increases",
      vKind = "pmod", vNs = "go", vId = "0043039",
      vName = "tRNA aminoacylation"),
    // the three with subject activities (SUBJECT_ACTIVITIES, :300-316)
    Rel(mi("0883", "gtpase reaction"), "increases",
      vKind = "pmod", vNs = "go", vId = "0003924", vName = "GTPase activity",
      subjActNs = "go", subjActId = "0003924", subjActName = "GTPase activity"),
    Rel(mi("0882", "atpase reaction"), "increases",
      vKind = "pmod", vNs = "go", vId = "0016887", vName = "ATPase activity",
      subjActNs = "go", subjActId = "0016887", subjActName = "ATPase activity"),
    Rel(mi("1146", "phospholipase reaction"), "increases",
      vKind = "pmod", vNs = "go", vId = "0004620",
      vName = "phospholipase activity",
      subjActNs = "go", subjActId = "0004620",
      subjActName = "phospholipase activity"),
    // --- dna strand elongation: gene target with gmod (:660-681) ---------
    Rel(mi("0701", "dna strand elongation"), "increases", targetFn = "Gene",
      vKind = "gmod", vNs = "go", vId = "0022616",
      vName = "DNA strand elongation"),
    // --- decreases (:683-839) --------------------------------------------
    // dna/rna cleavage retype the target and (reference quirk, :688/:702)
    // take the SOURCE id as the target identifier — replicated for parity.
    Rel(mi("0572", "dna cleavage"), "decreases", targetFn = "Gene",
      targetIdFromSource = true),
    Rel(mi("0902", "rna cleavage"), "decreases", targetFn = "Rna",
      targetIdFromSource = true),
    Rel(mi("0194", "cleavage reaction"), "decreases"),
    Rel(mi("0570", "protein cleavage"), "decreases"),
    Rel(mi("1355", "lipid cleavage"), "decreases",
      vKind = "pmod", vNs = "go", vId = "0016042",
      vName = "lipid catabolic process", objActivity = true),
    Rel(mi("0212", "lipoprotein cleavage reaction"), "decreases",
      vKind = "pmod", vNs = "go", vId = "0042160",
      vName = "lipoprotein modification", objActivity = true),
    Rel(mi("0199", "deformylation reaction"), "decreases",
      vKind = "pmod", vNs = "go", vId = "0018256",
      vName = "protein formylation"),
    Rel(mi("2280", "deamidation reaction"), "decreases",
      vKind = "pmod", vNs = "go", vId = "0018032",
      vName = "protein amidation", objActivity = true),
    Rel(mi("1140", "decarboxylation reaction"), "decreases",
      vKind = "pmod", vNs = "go", vId = "0018214",
      vName = "protein carboxylation"),
    Rel(mi("0985", "deamination reaction"), "decreases",
      vKind = "pmod", vNs = "go", vId = "0043176", vName = "amine binding"),
    // PROTEIN_DECREASES_MOD_DICT (:389-395)
    Rel(mi("0197", "deacetylation reaction"), "decreases",
      vKind = "pmod", vNs = "bel", vName = "Ac"),
    Rel(mi("0204", "deubiquitination reaction"), "decreases",
      vKind = "pmod", vNs = "bel", vName = "Ub"),
    Rel(mi("0203", "dephosphorylation reaction"), "decreases",
      vKind = "pmod", vNs = "bel", vName = "Ph"),
    Rel(mi("0569", "deneddylation reaction"), "decreases",
      vKind = "pmod", vNs = "bel", vName = "Nedd"),
    Rel(mi("0871", "demethylation reaction"), "decreases",
      vKind = "pmod", vNs = "bel", vName = "Me"),
    // --- association / regulates / binds (:280-298) ----------------------
    Rel(mi("1127", "putative self interaction"), "association"),
    Rel(mi("0914", "association"), "association"),
    Rel(mi("1126", "self interaction"), "association"),
    Rel(mi("0915", "physical association"), "association"),
    Rel(mi("0414", "enzymatic reaction"), "association"),
    Rel(mi("0403", "colocalization"), "association"),
    Rel(mi("0407", "direct interaction"), "regulates"),
    Rel(mi("0195", "covalent binding"), "binds"),
    Rel(mi("0408", "disulfide bond"), "binds"))

  /** Interaction types omitted before dispatch (intact.py:397-399,524). */
  val omitInteractions: Seq[String] = Seq(mi("1110", "predicted interaction"))

  def relationDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rels.map(r => (r.psiMi, r.bel, r.targetFn, r.targetIdFromSource,
      r.vKind, r.vNs, r.vId, r.vName,
      r.subjActNs, r.subjActId, r.subjActName, r.objActivity))
      .toDF("psi_mi", "bel_relation", "target_fn", "target_id_from_source",
        "v_kind", "v_ns", "v_id", "v_name",
        "subj_ns", "subj_id", "subj_name", "obj_activity")
  }

  /** Injected grounding dimensions (reference's pyobo/protmapper lookups,
    * intact.py:436-510; zero-egress ⇒ DataFrames, never network). All are
    * dictionary-sized and MUST broadcast. */
  final case class Mappings(
      uniprotToEntrez: DataFrame,  // (uniprot_id, ncbigene_id)
      uniprotMnemonic: DataFrame,  // (uniprot_id, mnemonic)
      ncbigeneNames: DataFrame,    // (ncbigene_id, ncbigene_name)
      chebiNames: DataFrame,       // (chebi_id, chebi_name)
      complexportal: DataFrame,    // (intact_id, complexportal_id)
      reactome: DataFrame)         // (intact_id, reactome_id)

  val mitabSchema: StructType = StructType(Seq(
    StructField("interactor_a", StringType),
    StructField("interactor_b", StringType),
    StructField("interaction_type", StringType),
    StructField("publication", StringType),
    StructField("detection_method", StringType),
    StructField("source_database", StringType),
    StructField("confidence", StringType)))

  /** S6: MITAB TSV scan with explicit schema, '-' as NA
    * (intact.py:513-519). */
  def readMitab(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true").option("nullValue", "-")
      .schema(mitabSchema)
      .csv(path)

  /** One combined lookup dimension: (kind, key) → (prefix, identifier,
    * name), with the reference's precedence rules resolved at dim-build
    * time (entrez-over-mnemonic for uniprot, complexportal-over-reactome
    * for intact — intact.py:458-510). Dims are dictionary-sized, so
    * pre-joining them costs nothing and turns the 6-joins-per-side
    * resolution into ONE broadcast hash join per side. */
  def combinedDim(m: Mappings): DataFrame = {
    val uniHit = m.uniprotToEntrez.toDF("k", "e")
      .join(m.ncbigeneNames.toDF("e2", "en"), col("e") === col("e2"), "left")
      .select(lit("uniprotkb").as("kind"), col("k").as("key"),
        lit("ncbigene").as("r_prefix"), col("e").as("r_id"),
        col("en").as("r_name"))
    val uniMiss = m.uniprotMnemonic.toDF("k", "mn")
      .join(m.uniprotToEntrez.toDF("k2", "e"),
        col("k") === col("k2"), "left_anti")
      .select(lit("uniprotkb").as("kind"), col("k").as("key"),
        lit("uniprot").as("r_prefix"), col("k").as("r_id"),
        col("mn").as("r_name"))
    val chebi = m.chebiNames.toDF("k", "nm")
      .select(lit("chebi").as("kind"), col("k").as("key"),
        lit("chebi").as("r_prefix"), col("k").as("r_id"),
        col("nm").as("r_name"))
    val cpx = m.complexportal.toDF("k", "c")
      .select(lit("intact").as("kind"), col("k").as("key"),
        lit("complexportal").as("r_prefix"), col("c").as("r_id"),
        lit(null).cast("string").as("r_name"))
    val reactome = m.reactome.toDF("k", "r")
      .join(m.complexportal.toDF("k2", "c"),
        col("k") === col("k2"), "left_anti")
      .select(lit("intact").as("kind"), col("k").as("key"),
        lit("reactome").as("r_prefix"), col("r").as("r_id"),
        lit(null).cast("string").as("r_name"))
    uniHit.unionByName(uniMiss).unionByName(chebi)
      .unionByName(cpx).unionByName(reactome)
  }

  /** F3 (intact.py:458-510): CURIE-dispatch one interactor column into
    * (prefix, identifier, name) columns `<out>_prefix/identifier/name`.
    * Pure expressions + ONE broadcast left join against [[combinedDim]];
    * lookup misses fall back per kind (uniprot/chebi/intact passthrough,
    * chembl/intenz purely syntactic, unhandled → null). */
  def resolveInteractor(df: DataFrame, inCol: String, out: String,
                        dim: DataFrame): DataFrame = {
    val s = col(inCol)
    val kind = when(s.startsWith("uniprotkb:"), "uniprotkb")
      .when(s.startsWith("chebi:\"CHEBI:"), "chebi")
      .when(s.startsWith("chembl target:"), "chembl")
      .when(s.startsWith("intact:"), "intact")
      .when(s.startsWith("intenz:"), "intenz")
      .otherwise("unhandled")
    val rawId = when(kind === "uniprotkb", Curies.stripPrefix(s, "uniprotkb:"))
      .when(kind === "chebi",
        expr(s"substring($inCol, ${"chebi:\"CHEBI:".length + 1}, " +
          s"length($inCol) - ${"chebi:\"CHEBI:".length + 1})"))
      .when(kind === "chembl",
        expr(s"substring($inCol, ${"chembl target:".length + 1}, " +
          s"length($inCol) - ${"chembl target:".length + 1})"))
      .when(kind === "intact", Curies.stripPrefix(s, "intact:"))
      .when(kind === "intenz", Curies.stripPrefix(s, "intenz:"))
    val k = s"${out}_kind"; val r = s"${out}_raw"
    val joined = df
      .withColumn(k, kind).withColumn(r, rawId)
      .join(broadcast(dim.toDF(s"${out}_dk", s"${out}_key", s"${out}_rp",
        s"${out}_ri", s"${out}_rn")),
        col(k) === col(s"${out}_dk") && col(r) === col(s"${out}_key"),
        "left")
    val hit = col(s"${out}_rp").isNotNull
    val prefix =
      when(hit, col(s"${out}_rp"))
        .when(col(k) === "uniprotkb", lit("uniprot"))
        .when(col(k) === "chebi", lit("chebi"))
        .when(col(k) === "chembl", lit("chembl.target"))
        .when(col(k) === "intact", lit("intact"))
        .when(col(k) === "intenz", lit("eccode"))
    val identifier = when(hit, col(s"${out}_ri")).otherwise(col(r))
    val name = when(hit, col(s"${out}_rn"))
    joined
      .withColumn(s"${out}_prefix", prefix)
      .withColumn(s"${out}_identifier", when(prefix.isNotNull, identifier))
      .withColumn(s"${out}_name", when(prefix.isNotNull, name))
      .drop(k, r, s"${out}_dk", s"${out}_key", s"${out}_rp", s"${out}_ri",
        s"${out}_rn")
  }

  /** A11: tally of unmapped CURIE prefixes (the reference's `_unhandled`
    * Counter, intact.py:454-455,507-510) — a side aggregation, not state. */
  def unhandledTally(raw: DataFrame): DataFrame = {
    def pre(c: String) = substring_index(col(c), ":", 1)
    raw.select(pre("interactor_a").as("prefix"))
      .unionByName(raw.select(pre("interactor_b").as("prefix")))
      .filter(!col("prefix").isin("uniprotkb", "intact", "intenz") &&
        !col("prefix").startsWith("chebi") &&
        !col("prefix").startsWith("chembl"))
      .groupBy("prefix").agg(count(lit(1)).as("n"))
  }

  /** S6+P8-P11+F1-F3 (intact.py:513-545): the processed interaction frame.
    * Filter order matters and is kept explicit: dropna → omit-list →
    * ground interactors → drop unmapped → pmid/score extraction → EBI-
    * exclusion (cheap filters precede the join-heavy grounding where the
    * reference had them before its expensive map calls). */
  def processed(raw: DataFrame, m: Mappings): DataFrame = {
    val cleaned = raw
      .na.drop()
      .filter(!col("interaction_type").isin(omitInteractions: _*))
    val dim = combinedDim(m)
    val groundedA = resolveInteractor(cleaned, "interactor_a", "src", dim)
    val grounded = resolveInteractor(groundedA, "interactor_b", "dst", dim)
    grounded
      .filter(col("src_prefix").isNotNull && col("dst_prefix").isNotNull)
      .withColumn("pmid",
        Curies.firstWithPrefix(col("publication"), "pubmed:"))
      .withColumn("score",
        Curies.firstWithPrefix(col("confidence"), "intact-miscore:"))
      .filter(!col("src_identifier").contains("EBI-") &&
        !col("dst_identifier").contains("EBI-"))
  }

  /** Node function per grounded prefix (NAMESPACE_TO_DSL, intact.py:588-591:
    * chebi → Abundance, complexportal → NamedComplexAbundance, else
    * Protein). */
  private def fnOf(prefix: Column): Column =
    when(prefix === "chebi", "Abundance")
      .when(prefix === "complexportal", "NamedComplexAbundance")
      .otherwise("Protein")

  /** G1 (intact.py:595-875): relation dispatch as one broadcast join.
    * Returns (edges, rejects): rejects = rows whose relation has no
    * dispatch entry (reference logs-and-skips, :577-584,875). */
  def toBel(processed: DataFrame): (DataFrame, DataFrame) = {
    val spark = processed.sparkSession
    val withNorm = processed
      .withColumn("norm_relation",
        Curies.normalizeWhitespace(col("interaction_type")))
    val joined = withNorm.join(
      broadcast(relationDim(spark)),
      withNorm("norm_relation") === col("psi_mi"), "left")
    val rejects = joined.filter(col("bel_relation").isNull)
      .select(processed.columns.toIndexedSeq.map(col): _*)

    val matched = joined.filter(col("bel_relation").isNotNull)
    val targetFn = coalesce(col("target_fn"), fnOf(col("dst_prefix")))
    val targetId = when(col("target_id_from_source"), col("src_identifier"))
      .otherwise(col("dst_identifier"))
    val variants = when(col("v_kind").isNotNull,
      array(struct(col("v_kind").as("kind"), col("v_ns").as("namespace"),
        col("v_id").as("identifier"), col("v_name").as("name"))))
      .otherwise(Terms.noVariants)
    val srcFn = fnOf(col("src_prefix"))

    // Dedup runs on an ALL-PRIMITIVE frame: first() over struct/map
    // columns has no mutable hash-agg buffer, so deduping after building
    // the nested columns would force a SortAggregate over the full wide
    // rows (measured 2-3× the whole pipeline cost at sf0.1). The nested
    // columns are rebuilt from the surviving primitives after the dedup.
    val flat = matched.select(
      srcFn.as("src_function"),
      col("src_prefix").as("src_namespace"),
      col("src_identifier"),
      col("src_name"),
      col("bel_relation").as("relation"),
      targetFn.as("dst_function"),
      col("dst_prefix").as("dst_namespace"),
      targetId.as("dst_identifier"),
      col("dst_name"),
      col("v_kind"), col("v_ns"), col("v_id"), col("v_name"),
      col("subj_ns"), col("subj_id"), col("subj_name"),
      col("obj_activity"),
      // citation falls back to the database (intact.py:624-625)
      coalesce(col("pmid"), lit("database:intact")).as("citation"),
      col("interaction_type"), col("detection_method"),
      col("source_database"), col("score"))
      .withColumn("src", Terms.termString(col("src_function"),
        col("src_namespace"), col("src_identifier"), col("src_name")))
      .withColumn("dst", Terms.termString(col("dst_function"),
        col("dst_namespace"), col("dst_identifier"), col("dst_name"),
        Terms.variantSuffix1(col("v_kind"), col("v_ns"), col("v_id"),
          col("v_name"))))

    // BELGraph dedups identical qualified edges (G8) by the hash of the
    // full qualified edge incl. annotations. The annotations map is built
    // from four statically-known keys, so its canonical sorted `k=v`
    // serialization is written out literally (keys differ before '=', so
    // value content can't reorder them); null-valued entries drop, exactly
    // as Graph.edgeId's map canonicalization does.
    def entry(k: String, v: Column) = concat(lit(k + "="), v)
    val canonicalAnnotations = concat_ws("",
      entry("intact-confidence", col("score")),
      entry("intact-detection", col("detection_method")),
      entry("intact-source", col("source_database")),
      entry("psi-mi", col("interaction_type")))
    // dropDuplicates over ALL columns, not the edge_id subset: a subset
    // dedup needs first() over the carried columns, whose var-length agg
    // buffers force SortAggregate; an all-columns dedup is a pure
    // group-keys HashAggregate (with map-side partial combine). Every
    // column here is a function of the edge-identity tuple, so the two
    // are semantically identical.
    val deduped = flat
      .withColumn("edge_id", xxhash64(col("src"), col("dst"),
        col("relation"), col("citation"), lit(Evidence),
        canonicalAnnotations))
      .dropDuplicates()

    val subjMod = when(col("subj_id").isNotNull,
      struct(lit("activity").as("kind"), col("subj_ns").as("namespace"),
        col("subj_id").as("identifier"), col("subj_name").as("name")))
      .otherwise(Terms.noModifier)
    val objMod = when(col("obj_activity"), Terms.activity())
      .otherwise(Terms.noModifier)
    val edges = deduped.select(
      col("src_function"), col("src_namespace"), col("src_identifier"),
      col("src_name"),
      Terms.noVariants.as("src_variants"),
      col("relation"),
      col("dst_function"), col("dst_namespace"), col("dst_identifier"),
      col("dst_name"),
      variants.as("dst_variants"),
      col("citation"),
      lit(Evidence).as("evidence"),
      map(
        lit("psi-mi"), col("interaction_type"),
        lit("intact-detection"), col("detection_method"),
        lit("intact-source"), col("source_database"),
        lit("intact-confidence"), col("score")).as("annotations"),
      subjMod.as("subject_modifier"),
      objMod.as("object_modifier"),
      col("src"), col("dst"), col("edge_id"))
    (edges, rejects)
  }
}
