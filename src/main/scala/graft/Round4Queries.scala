package graft

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.core.{SourceContext, Tables}

/** Round-4 harness registrations:
  *  - the oracle sweep of the remaining unit-only §2 operators (K7
  *    nodelink round-trip, S3 csv / S5 json readers, S1/S18 cache
  *    contracts, K1/K2 table lifecycle, K13 ER diagram);
  *  - the §7.6 incremental-populate merge (batch face of the streaming
  *    seam);
  *  - quality gates for the two formerly-`no_oracle` approximate
  *    operators (LSH ANN recall vs brute force; SimHash perturbed-twin
  *    Hamming invariant);
  *  - the scale-machinery faces: co-bucketed exchange-free join,
  *    persisted partition-pruned IVF index;
  *  - the composed deliverables: near-dup survivor clustering (text +
  *    embedding) and the end-to-end corpus-curation pipeline.
  *
  * File/warehouse fixtures are driver-side landing-zone writes at
  * plan-build time (dimension-sized by contract), as in Round3Queries.
  */
object Round4Queries {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def sfTag(d: String): String = new java.io.File(d).getName

  private def rmrf(s: SparkSession, path: String): Unit = {
    val hp = new HPath(path)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
  }

  private def writeText(path: String, content: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    path
  }

  private def lines(df: DataFrame): Seq[String] =
    df.orderBy(col(df.columns.head)).collect().map(_.getString(0)).toSeq

  /** One bucketed-table write per (session, sf dir) — reruns (bench n=2,
    * verify) reuse the warehouse tables instead of re-shuffling them. */
  private val bucketMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Unit]()

  /** One IVF index build per (session, sf dir) — index once, query many. */
  private val ivfIndexMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Unit]()

  // ==========================================================================
  // Registrations
  // ==========================================================================

  val queries: Map[String, Q] = Map[String, Q](

    // --- K7: nodelink dump — real writer, then read the JSON back --------
    "k7_nodelink" -> ((s, d) => {
      val edges = t(s, d, "lineitem").select(
        concat(lit("p:"), col("l_partkey")).as("src"),
        concat(lit("s:"), col("l_suppkey")).as("dst"),
        lit("interacts").as("relation")).distinct()
      val dir = s"/tmp/graft_k7_${sfTag(d)}"
      rmrf(s, dir)
      graft.bel.Exporters.nodelink(edges, dir)
      val nodes = s.read
        .schema(StructType(Seq(StructField("id", StringType))))
        .json(s"$dir/nodes")
        .select(lit("node").as("kind"), col("id").as("a"),
          lit("").as("b"), lit("").as("rel"))
      val links = s.read
        .schema(StructType(Seq(StructField("source", StringType),
          StructField("target", StringType),
          StructField("relation", StringType))))
        .json(s"$dir/links")
        .select(lit("link").as("kind"), col("source").as("a"),
          col("target").as("b"), col("relation").as("rel"))
      nodes.unionByName(links)
    }),

    // --- S3: schema'd CSV scan — non-default sep + nullValue --------------
    "s3_csv_reader" -> ((s, d) => {
      val body = lines(t(s, d, "nation").select(concat_ws(";",
        col("n_nationkey"), col("n_name"),
        when(col("n_regionkey") === 0, "NA").otherwise(col("n_regionkey"))
      ).as("l")))
      val path = writeText(s"/tmp/graft_s3_${sfTag(d)}.csv",
        ("k;name;region" +: body).mkString("", "\n", "\n"))
      graft.etl.Readers.csv(s, path,
        StructType(Seq(StructField("k", IntegerType),
          StructField("name", StringType),
          StructField("region", StringType))),
        sep = ";", nullValue = "NA")
    }),

    // --- S5: schema'd JSON-lines scan -------------------------------------
    "s5_json_reader" -> ((s, d) => {
      val body = lines(t(s, d, "region").select(concat(
        lit("{\"rid\":"), col("r_regionkey"),
        lit(",\"rname\":\""), col("r_name"), lit("\"}")).as("l")))
      val path = writeText(s"/tmp/graft_s5_${sfTag(d)}.json",
        body.mkString("", "\n", "\n"))
      graft.etl.Readers.json(s, path,
        StructType(Seq(StructField("rid", LongType),
          StructField("rname", StringType))))
    }),

    // --- S1/S2 + S18: landing-cache and derived-artifact contracts --------
    "s1_s18_cache" -> ((s, d) => {
      val dir = s"/tmp/graft_s1_${sfTag(d)}"
      rmrf(s, dir)
      var fetches = 0
      val landing = s"$dir/landed.txt"
      def fetch(p: String): Unit = { fetches += 1; writeText(p, "payload"); () }
      val first = graft.etl.Readers.ensureLanded(s, landing, fetch)
      val second = graft.etl.Readers.ensureLanded(s, landing, fetch)
      var builds = 0
      val artifact = s"$dir/artifact"
      def build(): DataFrame = {
        builds += 1
        t(s, d, "region").select(col("r_regionkey"))
      }
      val n1 = graft.etl.Readers.cachedOrBuild(s, artifact)(() => build()).count()
      val n2 = graft.etl.Readers.cachedOrBuild(s, artifact)(() => build()).count()
      import s.implicits._
      Seq((first, second, fetches, builds, n1 == n2))
        .toDF("first_fetch", "second_fetch", "n_fetches", "n_builds",
          "stable_rows")
    }),

    // --- K1/K2: DDL + batch write + drop lifecycle with provenance --------
    "k1_k2_table_lifecycle" -> ((s, d) => {
      val wh = s"/tmp/graft_k1k2_${sfTag(d)}"
      rmrf(s, wh)
      val ctx = new SourceContext(s, wh, "toy")
      val toy = new graft.core.Source {
        override def moduleName: String = "toy"
        override def tables: Seq[String] = Seq("model")
        // the reference's canonical 5-row toy source (tests/constants.py:17)
        override def populate(c: SourceContext): Unit = {
          import c.spark.implicits._
          c.write("model",
            (1 to 5).map(i => (s"MODEL:$i", i.toString * 5))
              .toDF("test_id", "name"))
        }
      }
      val before = toy.isPopulated(ctx)
      ctx.populateWithProvenance(toy)
      val after = toy.isPopulated(ctx)
      val n = ctx.read("model").count()
      ctx.drop(toy)
      val dropped = !ctx.exists("model")
      val acts = ctx.actions.ls().select("action").collect()
        .map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
      import s.implicits._
      Seq((before, after, n, dropped,
        acts.getOrElse("populate", 0), acts.getOrElse("drop", 0)))
        .toDF("before_populate", "after_populate", "n_rows", "dropped",
          "n_populate_actions", "n_drop_actions")
    }),

    // --- J1 over co-bucketed warehouse tables -----------------------------
    // The §4.3 partitioning story made real: membership and pathway tables
    // written bucketed by the join key join with NO exchange on either
    // side (BucketingSpec pins the plan; this query pins the results).
    // Bucketed once per (session, sf) — the write is the amortized cost.
    "j1_bucketed_join" -> ((s, d) => {
      val tag = sfTag(d).replace(".", "_")
      bucketMemo.computeIfAbsent((s, d), { _ =>
        graft.core.Bucketing.writeBucketed(
          t(s, d, "lineitem").select(
            col("l_partkey").as("pathway_id"),
            col("l_suppkey").as("protein_id")),
          s"bkt_membership_$tag", s"/tmp/graft_bkt_$tag/membership",
          "pathway_id", buckets = 8)
        graft.core.Bucketing.writeBucketed(
          t(s, d, "part").select(
            col("p_partkey").as("pathway_id"), col("p_name").as("name")),
          s"bkt_pathways_$tag", s"/tmp/graft_bkt_$tag/pathways",
          "pathway_id", buckets = 8)
      })
      graft.core.Bucketing.read(s, s"bkt_membership_$tag")
        .join(graft.core.Bucketing.read(s, s"bkt_pathways_$tag"),
          "pathway_id")
        .select(col("name").as("pathway"), col("protein_id"))
    }),

    // --- K13: ER diagram from StructType metadata -------------------------
    "k13_er_diagram" -> ((s, d) => {
      val store = Queries.pathwayStore(s, d)
      import graft.bel.Exporters.ErRelation
      val text = graft.bel.Exporters.erDiagram(
        Seq("pathway" -> store.pathways.schema,
          "protein" -> store.proteins.schema,
          "membership" -> store.membership.schema),
        Seq(ErRelation("membership", "pathway_id", "pathway", "pathway_id"),
          ErRelation("membership", "protein_id", "protein", "protein_id")),
        Map("pathway" -> "pathway_id", "protein" -> "protein_id"))
      import s.implicits._
      text.stripSuffix("\n").split("\n", -1).toSeq
        .zipWithIndex.map { case (l, i) => (i, l) }.toDF("lineno", "line")
    }),

    // --- Persisted IVF index: partition-pruned probing, exact-mode oracle -
    // Built on 3/4 of the corpus, GROWN to full via IvfIndex.append — the
    // exact-mode oracle then also gates the incremental-append path (a
    // dropped/duplicated/rewritten row would break the brute-force hash).
    "s_ivf_index_topk" -> ((s, d) => {
      val path = s"/tmp/graft_ivfidx_${sfTag(d)}"
      ivfIndexMemo.computeIfAbsent((s, d), { _ =>
        val emb = t(s, d, "embeddings")
        graft.ops.IvfIndex.build(emb.filter(col("vec_id") % 4 =!= 0), path,
          nList = 8)
        graft.ops.IvfIndex.append(s, path,
          emb.filter(col("vec_id") % 4 === 0))
        ()
      })
      val queriesDf = t(s, d, "embeddings").filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.ops.IvfIndex.topK(s, path, queriesDf, k = 4, nProbe = 8)
        .withColumn("cosine", round(col("cosine"), 6))
    }),

    // --- Quality gate for LSH ANN (was `no_oracle` s_lsh_topk) -----------
    // Driver embeddings are random (nearest non-self cosine ≈ 0.5), which
    // is NOT the regime LSH serves — so the gate synthesizes the near-dup
    // regime exactly like d_embed_pairs: every vector gets a perturbed
    // twin, the true top-1 of each query IS its twin, and lshTopK must
    // recover ≥ 95% of brute-force's top-1 picks. Probed recall on the
    // driver corpora: 16/16 at sf0.01 and sf0.1.
    "s_lsh_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("embedding"))
      val twins = base.select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.001) * sin(col("vec_id") * 7)).as("embedding"))
      val corpus = base.unionByName(twins)
      val qs = base.filter(col("vec_id") < 16)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val brute = graft.ops.Similarity.bruteForceTopK(corpus, qs, k = 1)
        .select("query_id", "id")
      val lsh = graft.ops.Similarity.lshTopK(corpus, qs, k = 1)
        .select("query_id", "id")
      val hit = brute.join(lsh, Seq("query_id", "id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      val tot = brute.agg(count(lit(1)).as("n_true"))
      hit.crossJoin(tot).select(
        (col("n_hit").cast("double") / col("n_true") >= 0.95)
          .as("recall_ok"))
    }),

    // --- Quality gate for SimHash (was `no_oracle` d_simhash) -------------
    // Perturbed-twin invariant: appending ONE token (one extra shingle)
    // must move the 64-bit fingerprint far less than chance — probed max
    // twin Hamming is 13 (sf0.01) / 17 (sf0.1) vs ~32 for random pairs,
    // so the gate pins ≤ 24. Discrimination: ≥ 90% of documents keep
    // distinct fingerprints (probed 499/500 and 4982/5000) — a collapsed
    // or near-constant hash fails.
    "d_simhash_invariant" -> ((s, d) => {
      val docs = t(s, d, "documents")
      def sh(df: DataFrame): DataFrame = df.select(col("doc_id"),
        graft.ops.Dedup.simHash(
          graft.ops.TextAnalysis.wordShingleHashes(col("text"), 3)).as("h"))
      val base = sh(docs)
      val twin = sh(docs.select(col("doc_id"),
        concat(col("text"), lit(" graftmarker")).as("text")))
      val twinOk = base.withColumnRenamed("h", "h1")
        .join(twin.withColumnRenamed("h", "h2"), "doc_id")
        .select(bit_count(col("h1").bitwiseXOR(col("h2"))).as("ham"))
        .agg((max("ham") <= 24).as("twins_close"))
      val distinctOk = base.agg(
        (countDistinct(col("h")).cast("double") / count(lit(1)) >= 0.9)
          .as("discriminative"))
      twinOk.crossJoin(distinctOk)
    }),

    // --- Near-dup clusters + survivor per cluster -------------------------
    // The actual dedup deliverable: LSH pairs closed under transitivity by
    // distributed connected components, min-id survivor per component.
    "d_neardup_survivors" -> ((s, d) =>
      graft.ops.Dedup.nearDupSurvivors(t(s, d, "documents"),
        n = 3, threshold = 0.8)),

    // --- Embedding-space near-dup survivors (same twin construction as
    // d_embed_pairs, Round3Queries) — each perturbed twin must map to its
    // base vector, every base vector to itself.
    "d_embed_survivors" -> ((s, d) => {
      val base = t(s, d, "embeddings").select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("embedding"))
      val perturbed = base.select(
        (col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.001) * sin(col("vec_id") * 7)).as("embedding"))
      graft.ops.Dedup.embeddingNearDupSurvivors(
        base.unionByName(perturbed), threshold = 0.99)
    }),

    // --- End-to-end corpus curation: the LLM ops composed -----------------
    // quality filter → exact-dedup survivors → language filter — one
    // declarative plan, each stage an operator this engine already gates
    // individually. The pipeline a training-data pass actually runs.
    "t_curate_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val quality = graft.ops.TextAnalysis.qualityMetrics(docs)
        .filter(col("n_tokens") >= 10 && col("alpha_ratio") >= 0.5)
      val survivors = graft.ops.Dedup.exactSurvivors(docs)
        .select(col("survivor_id").as("doc_id"))
      quality.join(survivors, Seq("doc_id"), "left_semi")
        .filter(graft.ops.TextAnalysis.langId(col("text")) === "en")
        .select("doc_id", "n_tokens")
    }),

    // --- §7.6 incremental populate: batch face of the streamed merge ------
    // Bucketed target (production shape): the per-batch anti-join reads the
    // existing keys through the bucketed catalog scan and shuffles only the
    // incoming batch (plan pinned in StreamingSpec).
    "k1_incremental_merge" -> ((s, d) => {
      val tag = sfTag(d).replace(".", "_")
      val wh = s"/tmp/graft_incmerge_$tag"
      rmrf(s, wh)
      val ctx = new SourceContext(s, wh, s"inc_$tag")
      s.sql(s"DROP TABLE IF EXISTS ${ctx.catalogName("entries")}")
      val sup = t(s, d, "supplier").select(
        concat(lit("I"), col("s_suppkey")).as("identifier"),
        col("s_name").as("name"))
      def merge(batch: DataFrame): Long =
        graft.streaming.IncrementalPopulate.mergeBatch(
          ctx, "inc", "entries", Seq("identifier"), batch, buckets = 8)
      // three overlapping batches; anti-join must land each key once
      merge(sup.filter(pmod(col("identifier").substr(lit(2), lit(10))
        .cast("long"), lit(2)) === 0))
      merge(sup.filter(pmod(col("identifier").substr(lit(2), lit(10))
        .cast("long"), lit(3)) === 0))
      merge(sup)
      ctx.read("entries").select("identifier", "name")
    }))

  // ==========================================================================
  // DuckDB oracles
  // ==========================================================================

  val oracleSql: Map[String, String] = Map(
    "k7_nodelink" ->
      """WITH edges AS (
        |  SELECT DISTINCT 'p:' || l_partkey AS src, 's:' || l_suppkey AS dst
        |  FROM lineitem
        |)
        |SELECT 'node' AS kind, node AS a, '' AS b, '' AS rel FROM (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))
        |UNION ALL
        |SELECT 'link' AS kind, src AS a, dst AS b, 'interacts' AS rel
        |FROM edges
        |""".stripMargin,

    "s3_csv_reader" ->
      ("SELECT CAST(n_nationkey AS INT) AS k, n_name AS name, " +
        "CASE WHEN n_regionkey = 0 THEN NULL " +
        "ELSE CAST(n_regionkey AS VARCHAR) END AS region FROM nation"),

    "s5_json_reader" ->
      ("SELECT CAST(r_regionkey AS BIGINT) AS rid, r_name AS rname " +
        "FROM region"),

    "s1_s18_cache" ->
      ("SELECT true AS first_fetch, false AS second_fetch, " +
        "CAST(1 AS INT) AS n_fetches, CAST(1 AS INT) AS n_builds, " +
        "true AS stable_rows"),

    "k1_k2_table_lifecycle" ->
      ("SELECT false AS before_populate, true AS after_populate, " +
        "CAST(5 AS BIGINT) AS n_rows, true AS dropped, " +
        "CAST(1 AS INT) AS n_populate_actions, " +
        "CAST(1 AS INT) AS n_drop_actions"),

    "k1_incremental_merge" ->
      "SELECT 'I' || s_suppkey AS identifier, s_name AS name FROM supplier",

    "d_neardup_survivors" ->
      s"""WITH pairs AS (${Queries.jaccardSql}),
         |und AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION SELECT id_b AS u, id_a AS v FROM pairs
         |), verts AS (
         |  SELECT DISTINCT u AS n FROM und
         |), walk AS (
         |  WITH RECURSIVE w(n, comp) AS (
         |    SELECT n, n FROM verts
         |    UNION
         |    SELECT e.v, w.comp FROM w JOIN und e ON w.n = e.u
         |  )
         |  SELECT n, min(comp) AS comp FROM w GROUP BY n
         |)
         |SELECT d.doc_id, coalesce(walk.comp, d.doc_id) AS survivor_id
         |FROM documents d LEFT JOIN walk ON d.doc_id = walk.n
         |""".stripMargin,

    // sound because d_embed_pairs already pins the pair set to EXACTLY the
    // (i, i+1e6) twins (hash-equal to the exact all-pairs cosine oracle at
    // τ=0.99; max base-pair cosine ≈ 0.51), so components are the twin
    // pairs and the survivor is always the base id.
    "d_embed_survivors" ->
      ("SELECT vec_id, vec_id AS survivor_id FROM embeddings " +
        "UNION ALL " +
        "SELECT vec_id + 1000000 AS vec_id, vec_id AS survivor_id " +
        "FROM embeddings"),

    "t_curate_pipeline" ->
      s"""WITH qm AS (
         |  SELECT doc_id, text,
         |    CASE WHEN len(trim(text)) = 0 THEN 0 ELSE
         |      len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         |    round(CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
         |      / nullif(len(text), 0), 4) AS alpha_ratio
         |  FROM documents
         |), surv AS (
         |  SELECT min(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
         |)
         |SELECT qm.doc_id, qm.n_tokens
         |FROM qm
         |JOIN surv ON qm.doc_id = surv.doc_id
         |JOIN (${Queries.langIdSql}) lang ON qm.doc_id = lang.doc_id
         |WHERE qm.n_tokens >= 10 AND qm.alpha_ratio >= 0.5
         |  AND lang.lang_pred = 'en'
         |""".stripMargin,

    "j1_bucketed_join" ->
      ("SELECT p_name AS pathway, l_suppkey AS protein_id FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey"),

    "k13_er_diagram" -> {
      val lines = Seq(
        "[membership]",
        "  pathway_id {label:\"bigint\"}",
        "  protein_id {label:\"bigint\"}",
        "",
        "[pathway]",
        "  *pathway_id {label:\"bigint\"}",
        "  identifier {label:\"string\"}",
        "  name {label:\"string\"}",
        "",
        "[protein]",
        "  *protein_id {label:\"bigint\"}",
        "  hgnc_id {label:\"string\"}",
        "  hgnc_symbol {label:\"string\"}",
        "",
        "pathway 1--* membership",
        "",
        "protein 1--* membership")
      lines.zipWithIndex
        .map { case (l, i) => s"(${i}, '${l.replace("'", "''")}')" }
        .mkString(
          "SELECT CAST(i AS INT) AS lineno, l AS line FROM (VALUES ",
          ", ", ") t(i, l)")
    },

    // exact mode (nProbe == nList): every cell probed ⇒ brute-force oracle
    "s_ivf_index_topk" -> Queries.oracleSql("s_brute_topk"),

    "s_lsh_recall" -> "SELECT true AS recall_ok",

    "d_simhash_invariant" ->
      "SELECT true AS twins_close, true AS discriminative")
}
