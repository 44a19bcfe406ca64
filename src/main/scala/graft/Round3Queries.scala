package graft

import java.nio.charset.{Charset, StandardCharsets}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.bel.{NamespaceFiles, NamespaceSpec, NamespaceStore}
import graft.compath.PathwayQueries
import graft.core.Tables

/** Round-3 harness registrations: real-reader round-trips for the file
  * scans (S4, S6–S9 — synthetic files written to /tmp, read back with the
  * ACTUAL readers so the scan options — separators, header, nullValue '-',
  * latin-1 — are what the oracle checks), the J5/J6 graph enrichers
  * (compath/manager.py:396-419), the namespace sink round-trips (K4/K5/K6/
  * K12), and the previously-unregistered full edge builds (Hmdd.toBel,
  * Go.hierarchyToBel).
  *
  * File-writing happens driver-side at plan-build time: these are landing-
  * zone fixtures (dimension-sized by the reference's contract), not data
  * paths.
  */
object Round3Queries {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def sfTag(d: String): String = new java.io.File(d).getName

  private def rmrf(s: SparkSession, path: String): Unit = {
    val hp = new HPath(path)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
  }

  private def writeText(path: String, content: String,
                        cs: Charset = StandardCharsets.UTF_8): String = {
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      content.getBytes(cs))
    path
  }

  private def writeZip(path: String, member: String, content: String): Unit = {
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry(member))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
  }

  /** Collect a one-string-column frame as sorted lines (file fixtures are
    * dimension-sized; sorting makes the file byte-deterministic). */
  private def lines(df: DataFrame): Seq[String] =
    df.orderBy(col(df.columns.head)).collect().map(_.getString(0)).toSeq

  private def pq(s: SparkSession, d: String) =
    new PathwayQueries(Queries.pathwayStore(s, d))

  private def supplierModels(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier").select(
      concat(lit("I"), col("s_suppkey")).as("identifier"),
      col("s_name").as("name"), lit("GRP").as("encoding"))

  private val graftSpec = NamespaceSpec("graft", "graft", "GRAFT", "_GRAFT")

  // ==========================================================================
  // Registrations
  // ==========================================================================

  val queries: Map[String, Q] = Map[String, Q](

    // --- S6: IntAct MITAB — real reader incl. nullValue '-' ---------------
    "s6_intact_mitab" -> ((s, d) => {
      val k = col("s_suppkey")
      val body = lines(t(s, d, "supplier").select(concat_ws("\t",
        concat(lit("uniprotkb:P"), k),
        concat(lit("intact:EBI-"), k),
        lit("psi-mi:\"MI:0915\"(physical association)"),
        concat(lit("pubmed:"), k),
        lit("psi-mi:\"MI:0084\"(phage display)"),
        lit("psi-mi:\"MI:0469\"(IntAct)"),
        when(pmod(k, lit(5)) === 0, lit("-"))
          .otherwise(concat(lit("intact-miscore:0."), pmod(k, lit(10))))
      ).as("l")))
      val header = "interactor_a\tinteractor_b\tinteraction_type\t" +
        "publication\tdetection_method\tsource_database\tconfidence"
      val path = writeText(s"/tmp/graft_s6_${sfTag(d)}.tsv",
        (header +: body).mkString("", "\n", "\n"))
      graft.sources.Intact.readMitab(s, path)
    }),

    // --- S7: BioGRID MITAB — no nullValue, '-' stays literal --------------
    "s7_biogrid_mitab" -> ((s, d) => {
      val k = col("c_custkey")
      val body = lines(t(s, d, "customer").select(concat_ws("\t",
        concat(lit("entrez gene/locuslink:"), k),
        concat(lit("entrez gene/locuslink:"), k + 7),
        lit("psi-mi:\"MI:0407\"(direct interaction)"),
        concat(lit("pubmed:"), pmod(k, lit(1000))),
        lit("psi-mi:\"MI:0018\"(two hybrid)"),
        lit("psi-mi:\"MI:0463\"(biogrid)"),
        lit("-")
      ).as("l")))
      val header = "interactor_a\tinteractor_b\tinteraction_type\t" +
        "publication\tdetection_method\tsource_database\tconfidence"
      val path = writeText(s"/tmp/graft_s7_${sfTag(d)}.tsv",
        (header +: body).mkString("", "\n", "\n"))
      graft.sources.Biogrid.readMitab(s, path)
    }),

    // --- S8: TFregulons CSV — quoted pmids field, int effect --------------
    "s8_tfregulons_csv" -> ((s, d) => {
      val k = col("s_suppkey")
      val body = lines(t(s, d, "supplier").select(concat_ws(",",
        concat(lit("TF"), k),
        concat(lit("TG"), k),
        pmod(k, lit(3)) - 1,
        when(pmod(k, lit(4)) === 0, "A").when(pmod(k, lit(4)) === 1, "B")
          .when(pmod(k, lit(4)) === 2, "C").otherwise("D"),
        concat(lit("\""), k, lit(","), k + 1, lit("\""))
      ).as("l")))
      val path = writeText(s"/tmp/graft_s8_${sfTag(d)}.csv",
        ("tf,target,effect,score,pmids" +: body).mkString("", "\n", "\n"))
      graft.sources.Tfregulons.readCsv(s, path)
    }),

    // --- S9: HMDD TSV — latin-1 bytes decoded by the reader ---------------
    "s9_hmdd_tsv" -> ((s, d) => {
      val k = col("n_nationkey")
      val body = lines(t(s, d, "nation").select(concat_ws("\t",
        lit("circulation"),
        concat(lit("hsa-mir-"), k),
        col("n_name"),
        k * 10,
        concat(lit("Désc "), k) // é = 0xE9 in ISO-8859-1
      ).as("l")))
      val path = writeText(s"/tmp/graft_s9_${sfTag(d)}.tsv",
        ("category\tmir\tdisease\tpmid\tdescription" +: body)
          .mkString("", "\n", "\n"),
        StandardCharsets.ISO_8859_1)
      graft.sources.Hmdd.readTsv(s, path)
    }),

    // --- S4: zipped-CSV landing — member extract then schema'd scan -------
    "s4_zip_csv" -> ((s, d) => {
      val body = lines(t(s, d, "region").select(
        concat_ws(",", col("r_regionkey"), col("r_name")).as("l")))
      val zip = s"/tmp/graft_s4_${sfTag(d)}.zip"
      val extract = s"/tmp/graft_s4_extract_${sfTag(d)}.csv"
      writeZip(zip, "data/regions.csv",
        ("region_id,region_name" +: body).mkString("", "\n", "\n"))
      rmrf(s, extract) // re-exercise the extraction every run
      graft.etl.Readers.zippedCsv(s, zip, "data/regions.csv", extract,
        StructType(Seq(StructField("region_id", IntegerType),
          StructField("region_name", StringType))))
    }),

    // --- Embedding-cosine near-dup: LSH bands + exact verify --------------
    // The driver's embeddings are random (max pair cosine ≈ 0.51), so the
    // near-dup regime is synthesized inside the query, as the G-series does
    // for raw inputs: each vector gets a deterministically perturbed twin
    // (+0.001·sin(7·id) on every dim) and the operator must recover
    // exactly the (i, i+1000000) twin pairs at threshold 0.99.
    "d_embed_pairs" -> ((s, d) => {
      val base = t(s, d, "embeddings").select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("embedding"))
      val perturbed = base.select(
        (col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.001) * sin(col("vec_id") * 7)).as("embedding"))
      // The gate pins PAIR RECOVERY; the cosine column is dropped because
      // 500 near-identical doubles cannot be sorted consistently across
      // engines (summation-order noise larger than any sort-quantization
      // bucket and smaller than none).
      graft.ops.Dedup.embeddingPairs(base.unionByName(perturbed),
        threshold = 0.99)
        .select("id_a", "id_b")
    }),

    // --- IVF ANN in exact mode (nProbe == nList ⇒ brute force) ------------
    "s_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queriesDf = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.ops.Similarity.ivfTopK(emb, queriesDf, k = 4,
        nList = 8, nProbe = 8)
        .withColumn("cosine", round(col("cosine"), 6))
    }),

    // --- J5: enrich pathway nodes already in a graph ----------------------
    "j5_graph_enrich" -> ((s, d) => {
      val k = col("p_partkey")
      val graphNodes = t(s, d, "part").select(
        when(pmod(k, lit(3)) === 0, lit("GRAFT")).otherwise(lit("other"))
          .as("namespace"),
        when(pmod(k, lit(7)) === 1, lit(null).cast("string"))
          .otherwise(k.cast("string")).as("identifier"))
      pq(s, d).enrichPathways(graphNodes, "graft")
    }),

    // --- J6: enrich pathways containing the graph's proteins --------------
    "j6_protein_enrich" -> ((s, d) => {
      val ids = t(s, d, "supplier")
        .filter(pmod(col("s_suppkey"), lit(4)) === 2)
        .select(concat(lit("HGNC:"), col("s_suppkey")).as("hgnc_id"))
      pq(s, d).enrichProteins(ids, "graft")
    }),

    // --- K4: annotation file lines (real writer) --------------------------
    "k4_annotation_lines" -> ((s, d) => {
      val content =
        NamespaceFiles.annotation(graftSpec, supplierModels(s, d))
      import s.implicits._
      content.stripSuffix("\n").split("\n", -1).toSeq.toDF("line")
    }),

    // --- K5: identifier→name mapping JSON lines (real writer) -------------
    "k5_mapping_lines" -> ((s, d) => {
      val content = NamespaceFiles.mappingJson(supplierModels(s, d))
      import s.implicits._
      content.split("\n", -1).toSeq.toDF("line")
    }),

    // --- K6: md5-guarded directory export — write then skip ---------------
    "k6_md5_guard" -> ((s, d) => {
      val dir = s"/tmp/graft_k6_${sfTag(d)}"
      rmrf(s, dir)
      val store = new NamespaceStore(s, s"$dir/store")
      val models = supplierModels(s, d)
      val first = NamespaceFiles.writeDirectory(store, graftSpec, models, dir)
      val second = NamespaceFiles.writeDirectory(store, graftSpec, models, dir)
      import s.implicits._
      Seq((first, second)).toDF("first_write", "second_write")
    }),

    // --- K12: namespace store round-trip: make → update → drop ------------
    "k12_ns_roundtrip" -> ((s, d) => {
      val base = s"/tmp/graft_nsstore_${sfTag(d)}"
      rmrf(s, base)
      val store = new NamespaceStore(s, base,
        clock = () => "2026-01-01T00:00:00Z")
      val k = col("s_suppkey")
      // make: even keys only
      store.upload(graftSpec,
        supplierModels(s, d).filter(pmod(k, lit(2)) === 0))
      // update: full batch, null names skipped; anti-join adds odd keys
      // whose key % 7 != 0
      store.upload(graftSpec,
        t(s, d, "supplier").select(
          concat(lit("I"), k).as("identifier"),
          when(pmod(k, lit(7)) === 0, lit(null).cast("string"))
            .otherwise(col("s_name")).as("name"),
          lit("GRP").as("encoding")),
        doUpdate = true)
      // a second namespace made then dropped — must not leak into the
      // output (exercises drop's rewrite-without)
      val other = NamespaceSpec.forModule("other")
      store.upload(other, supplierModels(s, d).limit(3))
      store.drop(other)
      store.entries(graftSpec.url).select("identifier", "name", "encoding")
    }),

    // --- G6 subhierarchy: is_a/part_of edges (go.py:108-122) --------------
    "g6_go_hierarchy" -> ((s, d) => {
      val k = col("n_nationkey")
      val hierarchy = t(s, d, "nation").select(
        lit("go").as("child_prefix"),
        concat(lit("C"), k).as("child_id"),
        col("n_name").as("child_name"),
        lit("go").as("parent_prefix"),
        concat(lit("P"), col("n_regionkey")).as("parent_id"),
        concat(lit("R"), col("n_regionkey")).as("parent_name"),
        when(pmod(k, lit(3)) === 0, "is_a")
          .when(pmod(k, lit(3)) === 1, "part_of")
          .otherwise("regulates").as("relation"))
      graft.sources.Go.hierarchyToBel(hierarchy)
    }),

    // --- HMDD full miRNA→disease edge build (hmdd.py:70-101) --------------
    "g9_hmdd_bel" -> ((s, d) => {
      val k = col("p_partkey")
      val raw = t(s, d, "part").select(
        lit("circulation").as("category"),
        when(pmod(k, lit(2)) === 0, concat(lit("hsa-mir-"), k))
          .otherwise(concat(lit("mirX"), k)).as("mir"),
        when(pmod(k, lit(4)) === 0, concat(lit("d "), k))
          .when(pmod(k, lit(4)) === 1, concat(k, lit(", d")))
          .when(pmod(k, lit(4)) === 2, concat(k, lit(", b, c")))
          .otherwise(concat(lit("unknown"), k)).as("disease"),
        k.cast("string").as("pmid"),
        concat(lit("desc "), k).as("description"))
      val mirbase = t(s, d, "part").filter(pmod(k, lit(3)) =!= 1)
        .select(concat(lit("hsa-mir-"), k).as("name"),
          lit("mirbase").as("prefix"),
          concat(lit("MI"), k).as("identifier"),
          concat(lit("hsa-mir-"), k).as("label"))
      val diseaseDict = t(s, d, "part").filter(pmod(k, lit(3)) =!= 0)
        .select(concat(lit("d "), k).as("name"),
          lit("mondo").as("prefix"),
          k.cast("string").as("identifier"),
          concat(lit("L"), k).as("label"))
        .unionByName(t(s, d, "part").filter(pmod(k, lit(4)) === 2)
          .select(concat(lit("c b "), k).as("name"),
            lit("doid").as("prefix"),
            concat(lit("R"), k).as("identifier"),
            concat(lit("L2_"), k).as("label")))
      graft.sources.Hmdd.toBel(raw, mirbase, diseaseDict)
        .select("src", "relation", "dst", "citation", "evidence")
    }))

  // ==========================================================================
  // DuckDB oracles
  // ==========================================================================

  val oracleSql: Map[String, String] = Map(
    // exact mode: IVF with nProbe == nList scores every pair, so the
    // brute-force oracle pins it exactly
    "s_ivf_topk" -> Queries.oracleSql("s_brute_topk"),

    "d_embed_pairs" ->
      """WITH b AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), p AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x + 0.001 * sin(vec_id * 7)) AS v
        |  FROM embeddings
        |), u AS (
        |  SELECT * FROM b UNION ALL SELECT * FROM p
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM u a JOIN u b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.99
        |""".stripMargin,

    "s6_intact_mitab" ->
      """SELECT 'uniprotkb:P' || s_suppkey AS interactor_a,
        |  'intact:EBI-' || s_suppkey AS interactor_b,
        |  'psi-mi:"MI:0915"(physical association)' AS interaction_type,
        |  'pubmed:' || s_suppkey AS publication,
        |  'psi-mi:"MI:0084"(phage display)' AS detection_method,
        |  'psi-mi:"MI:0469"(IntAct)' AS source_database,
        |  CASE WHEN s_suppkey % 5 = 0 THEN NULL
        |    ELSE 'intact-miscore:0.' || (s_suppkey % 10) END AS confidence
        |FROM supplier
        |""".stripMargin,

    "s7_biogrid_mitab" ->
      """SELECT 'entrez gene/locuslink:' || c_custkey AS interactor_a,
        |  'entrez gene/locuslink:' || (c_custkey + 7) AS interactor_b,
        |  'psi-mi:"MI:0407"(direct interaction)' AS interaction_type,
        |  'pubmed:' || (c_custkey % 1000) AS publication,
        |  'psi-mi:"MI:0018"(two hybrid)' AS detection_method,
        |  'psi-mi:"MI:0463"(biogrid)' AS source_database,
        |  '-' AS confidence
        |FROM customer
        |""".stripMargin,

    "s8_tfregulons_csv" ->
      ("SELECT 'TF' || s_suppkey AS tf_hgnc_symbol, " +
        "'TG' || s_suppkey AS target_hgnc_symbol, " +
        "CAST(s_suppkey % 3 - 1 AS INT) AS effect, " +
        "CASE s_suppkey % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'B' " +
        "WHEN 2 THEN 'C' ELSE 'D' END AS score, " +
        "s_suppkey || ',' || (s_suppkey + 1) AS pmids FROM supplier"),

    "s9_hmdd_tsv" ->
      ("SELECT 'circulation' AS category, " +
        "'hsa-mir-' || n_nationkey AS mir, n_name AS disease, " +
        "CAST(n_nationkey * 10 AS VARCHAR) AS pmid, " +
        "'Désc ' || n_nationkey AS description FROM nation"),

    "s4_zip_csv" ->
      ("SELECT CAST(r_regionkey AS INT) AS region_id, " +
        "r_name AS region_name FROM region"),

    "j5_graph_enrich" ->
      ("SELECT DISTINCT 'hgnc:' || s_name AS src, 'partOf' AS relation, " +
        "'graft:' || l_partkey AS dst FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE l_partkey % 3 = 0 AND l_partkey % 7 <> 1"),

    "j6_protein_enrich" ->
      ("SELECT DISTINCT 'hgnc:' || s_name AS src, 'partOf' AS relation, " +
        "'graft:' || l_partkey AS dst FROM lineitem " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "WHERE l_partkey IN (SELECT DISTINCT l_partkey FROM lineitem " +
        "WHERE l_suppkey % 4 = 2)"),

    "k4_annotation_lines" ->
      ("SELECT unnest(['[AnnotationDefinition]', 'Keyword=GRAFT', " +
        "'DescriptionString=graft', '', '[Values]']) AS line " +
        "UNION ALL SELECT s_name || '|GRP' FROM supplier"),

    "k5_mapping_lines" ->
      """WITH m AS (
        |  SELECT 'I' || s_suppkey AS id, s_name AS name FROM supplier
        |), mm AS (
        |  SELECT id, name, row_number() OVER (ORDER BY id DESC) AS rn
        |  FROM m
        |)
        |SELECT '  "' || id || '": "' || name || '"' ||
        |  CASE WHEN rn = 1 THEN '' ELSE ',' END AS line FROM mm
        |UNION ALL SELECT unnest(['{', '}']) AS line
        |""".stripMargin,

    "k6_md5_guard" ->
      "SELECT true AS first_write, false AS second_write",

    "k12_ns_roundtrip" ->
      ("SELECT 'I' || s_suppkey AS identifier, s_name AS name, " +
        "'GRP' AS encoding FROM supplier " +
        "WHERE s_suppkey % 2 = 0 OR s_suppkey % 7 <> 0"),

    "g6_go_hierarchy" ->
      ("SELECT DISTINCT 'BiologicalProcess(go:C' || n_nationkey || ' ! ' " +
        "|| n_name || ')' AS src, " +
        "CASE WHEN n_nationkey % 3 = 0 THEN 'isA' ELSE 'partOf' END " +
        "AS relation, " +
        "'BiologicalProcess(go:P' || n_regionkey || ' ! R' || n_regionkey " +
        "|| ')' AS dst FROM nation WHERE n_nationkey % 3 IN (0, 1)"),

    "g9_hmdd_bel" ->
      """SELECT DISTINCT
        |  'MicroRna(mirbase:MI' || p_partkey || ' ! hsa-mir-' || p_partkey
        |    || ')' AS src,
        |  'regulates' AS relation,
        |  CASE WHEN p_partkey % 4 = 0
        |    THEN 'Pathology(mondo:' || p_partkey || ' ! L' || p_partkey
        |      || ')'
        |    ELSE 'Pathology(doid:R' || p_partkey || ' ! L2_' || p_partkey
        |      || ')' END AS dst,
        |  'pubmed:' || p_partkey AS citation,
        |  'desc ' || p_partkey AS evidence
        |FROM part
        |WHERE p_partkey % 2 = 0 AND p_partkey % 3 <> 1
        |  AND ((p_partkey % 4 = 0 AND p_partkey % 3 <> 0)
        |    OR p_partkey % 4 = 2)
        |""".stripMargin)
}
