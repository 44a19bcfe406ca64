package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 gates — closing the verdict's maintenance/composition asks:
  *
  *  - `a28_cc_index_persist`: the PERSISTED incremental-CC label index
  *    ([[graft.bel.IncrementalCC.foldIndex]]) — two successive folds
  *    against the bucket-partitioned on-disk index must equal the
  *    from-scratch components of the 3-way union graph (the recursive
  *    CTE oracle), proving the touched-only overwrite discipline loses
  *    nothing across folds.
  *  - `a30_ppr`: personalized (seed-restart) PageRank
  *    ([[graft.bel.PageRank.runPersonalized]]) over the REVERSED
  *    dimension graph (region→nation→supplier), seeds r:0 (w=3) and
  *    r:1 (w=1) — the domain-expansion primitive, value-exact against
  *    the unrolled-recurrence SQL with per-node restart mass.
  *  - `s_ivf_rebuild`: staleness-driven IVF index maintenance
  *    ([[graft.ops.IvfIndex.rebuildIfStale]]) — an off-distribution
  *    append drifts the frozen Voronoi partition, the trigger fires
  *    past the stated threshold, the rebuild restores fit, and
  *    recall@10 at the bench budget still holds on the grown corpus.
  *  - `k20_zorder3_layout`: N-column Z-order
  *    ([[graft.ops.Layout.zorderCompactN]]) — 3-column interleave over
  *    lineitem's key triple, bit-exact vs the shift/mask SQL.
  *  - `k21_hilbert_layout`: Hilbert-curve clustering
  *    ([[graft.ops.Layout.hilbertCompactN]]) — same triple through the
  *    better-locality curve; content hash-preserved, code injectivity
  *    asserted at data scale in-gate.
  *  - `t_ngram_counts`: corpus trigram frequency table
  *    ([[graft.ops.TextAnalysis.ngramCounts]]), tail-pruned.
  *  - `t_url_parse`: URL scheme/host/registrable-domain/path extraction
  *    ([[graft.ops.TextAnalysis.urlHost]] family) over adversarial
  *    synthetic URLs.
  *  - `j21_resample_interp`: hourly-grid LINEAR interpolation
  *    ([[graft.ops.Temporal.resampleInterp]]) — j16's continuous-signal
  *    sibling, one window shuffle, no join.
  *  - `o11_topk_per_group`: bounded top-k rows per group
  *    ([[graft.ops.Rank.topKPerGroup]] over the native
  *    [[graft.functions.TopKRowsAgg]]) — map-side-pruned, vs the
  *    row_number-window oracle.
  *  - `a34_closeness`: landmark harmonic closeness
  *    ([[graft.bel.Bfs.harmonicCloseness]]) — per-seed BFS + lcm-exact
  *    harmonic sums, engine-bit-exact.
  *  - `w_curate_e2e`: the end-to-end continuous-curation composition
  *    ([[graft.streaming.CuratePipeline]]) — expectations → curate
  *    rules → dedup-index probe → append, one foreachBatch chain,
  *    value-exact vs the equivalent batch chain with cross-batch
  *    duplicates dropped and per-batch reports/metrics persisted.
  */
object Round10Queries {
  private type Q = (SparkSession, String) => DataFrame

  private val HourUs = 3600000000L

  private def sfTag(d: String): String =
    new java.io.File(d).getName.replace(".", "_")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  private def rmrf(s: SparkSession, path: String): Unit =
    graft.core.Fs.delete(s, path)

  private def memo[A](store: java.util.Map[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, A]],
      s: SparkSession, d: String)(build: () => A): A =
    store.synchronized {
      var m = store.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, A]()
        store.put(s, m)
      }
      m
    }.computeIfAbsent(d, _ => build())

  private val ccIdxMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private val ivfRebuildMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String,
        (Boolean, Boolean, Boolean, Boolean)]]())

  private val zorder3Memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private val hilbertMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private val erMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private val ccStreamMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private val curateMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String,
        (Boolean, Boolean, Boolean, Boolean)]]())

  /** Per-seed unrolled BFS relaxation + the lcm-exact harmonic fold —
    * the a21 `bfsOracle` pattern keyed on (seed, node). `levels` must
    * sit past the graph's eccentricity (extra levels are the
    * identity). */
  private def closenessOracle(levels: Int): String = {
    val steps = (1 to levels).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT seed, node, min(hops) AS hops FROM (
         |    SELECT seed, node, hops FROM d${i - 1}
         |    UNION ALL
         |    SELECT d${i - 1}.seed, adj.v, d${i - 1}.hops + 1
         |    FROM d${i - 1} JOIN adj ON d${i - 1}.node = adj.u)
         |  GROUP BY 1, 2
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e0 AS MATERIALIZED (
       |  SELECT a.pk AS a, b.pk AS b
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |), adj AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0
       |), d0 AS MATERIALIZED (
       |  SELECT p_partkey AS seed, p_partkey AS node, 0 AS hops FROM part
       |  WHERE p_partkey % 97 = 0
       |),
       |$steps
       |SELECT CAST(node AS BIGINT) AS node,
       |  CAST(count(*) AS BIGINT) AS n_landmarks,
       |  CAST(sum(hops) AS BIGINT) AS hop_mass,
       |  CAST(sum(232792560 // hops) AS DOUBLE) / 232792560 AS harmonic
       |FROM d$levels WHERE hops > 0 GROUP BY 1
       |""".stripMargin
  }

  val queries: Map[String, Q] = Map[String, Q](

    // --- Persisted incremental-CC label index -------------------------------
    // writeIndex(base) → foldIndex(nation→region) → foldIndex(customer→
    // nation) against the bucket-partitioned layout; read-back labels
    // canonicalized to min node per component must equal the recursive
    // CTE over the 3-way union. The fold chain runs once per (session,
    // sf) — the k18/w_stream_dedup_index layout-memo posture.
    "a28_cc_index_persist" -> ((s, d) => {
      val path = memo(ccIdxMemo, s, d) { () =>
        val base = t(s, d, "supplier").select(
          concat(lit("s:"), col("s_suppkey")).as("src"),
          concat(lit("n:"), col("s_nationkey")).as("dst"))
        val d1 = t(s, d, "nation").select(
          concat(lit("n:"), col("n_nationkey")).as("src"),
          concat(lit("r:"), col("n_regionkey")).as("dst"))
        val d2 = t(s, d, "customer").select(
          concat(lit("c:"), col("c_custkey")).as("src"),
          concat(lit("n:"), col("c_nationkey")).as("dst"))
        val p = s"/tmp/graft_ccidx_${sfTag(d)}"
        rmrf(s, p)
        graft.bel.IncrementalCC.writeIndex(
          graft.bel.ConnectedComponents.run(base), p, buckets = 16)
        graft.bel.IncrementalCC.foldIndex(s, p, d1, buckets = 16)
        graft.bel.IncrementalCC.foldIndex(s, p, d2, buckets = 16)
        p
      }
      val folded = graft.bel.IncrementalCC.readIndex(s, path)
      val canon = folded.groupBy("component").agg(min("node").as("comp"))
      folded.join(canon, "component").select("node", "comp")
    }),

    // --- Personalized PageRank (seed-restart) -------------------------------
    // Domain expansion over the REVERSED dimension graph: restart mass
    // 3:1 on regions r:0/r:1; ranks flow region→nation→supplier, so
    // suppliers score by weighted proximity to the seed regions. Same
    // AQE/partition scoping as a17 (dimension-sized graph, measured);
    // oracle = the unrolled recurrence with per-node restart mass.
    "a30_ppr" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      import ss.implicits._
      val rn = t(ss, d, "nation").select(
        concat(lit("r:"), col("n_regionkey")).as("src"),
        concat(lit("n:"), col("n_nationkey")).as("dst"))
      val ns = t(ss, d, "supplier").select(
        concat(lit("n:"), col("s_nationkey")).as("src"),
        concat(lit("s:"), col("s_suppkey")).as("dst"))
      val seeds = Seq(("r:0", 3.0), ("r:1", 1.0)).toDF("node", "weight")
      graft.bel.PageRank.runPersonalized(rn.unionByName(ns), seeds,
        iterations = 8)
    }),

    // --- Weighted PageRank ---------------------------------------------------
    // Link strength as transition probability: supplier→nation edges
    // weighted s_suppkey%7+1, nation→region n_nationkey%3+1 (integer
    // weights, engine-exact); contribution = rank·w / out-strength.
    // Same a17 scoping (dimension graph, measured); oracle = the
    // unrolled recurrence with per-edge weights.
    "a32_pagerank_weighted" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      val sup = t(ss, d, "supplier").select(
        concat(lit("s:"), col("s_suppkey")).as("src"),
        concat(lit("n:"), col("s_nationkey")).as("dst"),
        (col("s_suppkey") % 7 + 1).cast("double").as("weight"))
      val nat = t(ss, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"),
        (col("n_nationkey") % 3 + 1).cast("double").as("weight"))
      graft.bel.PageRank.runWeighted(sup.unionByName(nat), "weight",
        iterations = 8)
    }),

    // --- Streaming connected-components maintenance -------------------------
    // The stream face of the persisted label index: two edge batches
    // (supplier stars, then the nation→region + customer→nation deltas)
    // fold through CcStream's foreachBatch; the on-disk index after the
    // stream must equal the from-scratch components of the union graph.
    // Shares a28_cc_index_persist's oracle verbatim — identical
    // semantics across the faces is the point (the k19/w_stream_cdc
    // discipline).
    "w_stream_cc" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val path = memo(ccStreamMemo, s, d) { () =>
          val b1 = t(ss, d, "supplier").select(
              concat(lit("s:"), col("s_suppkey")).as("src"),
              concat(lit("n:"), col("s_nationkey")).as("dst"))
            .as[(String, String)].collect().toSeq
          val b2 = (t(ss, d, "nation").select(
              concat(lit("n:"), col("n_nationkey")).as("src"),
              concat(lit("r:"), col("n_regionkey")).as("dst"))
            .as[(String, String)].collect() ++
            t(ss, d, "customer").select(
              concat(lit("c:"), col("c_custkey")).as("src"),
              concat(lit("n:"), col("c_nationkey")).as("dst"))
            .as[(String, String)].collect()).toSeq
          val base = s"/tmp/graft_ccstream_${sfTag(d)}"
          rmrf(ss, base)
          val mem = MemoryStream[(String, String)]
          val q = graft.streaming.CcStream.run(
            mem.toDS().toDF("src", "dst"), s"$base/idx", s"$base/ckpt",
            buckets = 16)
          try {
            mem.addData(b1: _*); q.processAllAvailable()
            mem.addData(b2: _*); q.processAllAvailable()
          } finally q.stop()
          s"$base/idx"
        }
        val folded = graft.bel.IncrementalCC.readIndex(ss, path)
        val canon = folded.groupBy("component").agg(min("node").as("comp"))
        folded.join(canon, "component").select("node", "comp")
      }),

    // --- Label propagation communities --------------------------------------
    // Synchronous LPA over the undirected dimension graph, 5 rounds,
    // (count desc, label asc) tie-break — the community structure the
    // star-shaped supplier→nation→region graph collapses to. Value-exact
    // against the unrolled per-round SQL (count + row_number winner per
    // node per round); determinism rides the synchronous-update + total
    // tie-break contract the spec pins against a driver reference.
    // Perf, MEASURED (sf0.1, local[32], min-of-2): default cut-per-round
    // + session conf = 6.5 s; cutEvery=2 (the step is singly-referenced,
    // so un-cut pairs re-evaluate nothing) = 3.8 s; + the a17 scoping
    // (8 shuffle partitions, AQE off — dimension-sized loop) = 2.5 s.
    "a31_lpa" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      val sup = t(ss, d, "supplier").select(
        concat(lit("s:"), col("s_suppkey")).as("src"),
        concat(lit("n:"), col("s_nationkey")).as("dst"))
      val nat = t(ss, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.bel.LabelPropagation.run(sup.unionByName(nat), iterations = 5)
    }),

    // --- Modularity of the LPA communities ----------------------------------
    // Newman Q per community over the SAME undirected dimension graph
    // and the SAME 5-round LPA labeling: internal edge count, degree
    // mass, and q_c = l_c/m − (d_c/2m)² — the accept/reject quality
    // score for discovered clusters. All inputs exact integers; the Q
    // expression is written identically in the oracle (which re-derives
    // the labeling through the shared LPA CTE chain).
    "a33_modularity" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      val sup = t(ss, d, "supplier").select(
        concat(lit("s:"), col("s_suppkey")).as("src"),
        concat(lit("n:"), col("s_nationkey")).as("dst"))
      val nat = t(ss, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      val edges = sup.unionByName(nat)
      graft.bel.Modularity.perCommunity(edges,
        graft.bel.LabelPropagation.run(edges, iterations = 5))
    }),

    // --- IVF index maintenance: staleness-triggered rebuild -----------------
    // Clustered corpus (16 anchor cells); the index is built on cells
    // 0–7 only, then an append arrives entirely from cells 8–15 — real
    // distribution drift against the frozen centroids. The gate pins the
    // full maintenance loop: drift is DETECTED (append staleness over
    // the stated 0.1), the threshold TRIGGERS rebuildIfStale (layout
    // drift > 0.05), the rebuild RESTORES fit (positive improvement),
    // and recall@10 at the bench budget (nProbe 12 of nList 16) still
    // holds on the grown corpus vs brute-force truth.
    // (an 8-partition withShufflePartitions scoping was MEASURED NEUTRAL
    // here — 9.3 s vs 10.3 s single runs, within machine noise: the cost
    // is the ~10 sequential build/fit/rebuild/recall jobs, not exchange
    // width — so the gate keeps session defaults, the a28 discipline)
    "s_ivf_rebuild" -> ((s, d) => {
      import s.implicits._
      val (drift, fired, restored, recallOk) =
        memo(ivfRebuildMemo, s, d) { () =>
          val emb = t(s, d, "embeddings").select(col("vec_id"),
            graft.functions.Vectors.toDouble(col("embedding"))
              .as("embedding"))
          val anchors = broadcast(emb.filter(col("vec_id") < 16)
            .select((col("vec_id") % 16).as("k"),
              col("embedding").as("anchor")))
          val clustered = emb.filter(col("vec_id") >= 16)
            .withColumn("k", expr("(vec_id div 2) % 16"))
            .join(anchors, "k")
            .select(col("k"), col("vec_id"),
              zip_with(col("anchor"), col("embedding"),
                (a, x) => a + lit(0.05) * x).as("embedding"))
          val base = clustered.filter(col("k") < 8)
            .select("vec_id", "embedding")
          val newCells = clustered.filter(col("k") >= 8)
            .select("vec_id", "embedding")
          val path = s"/tmp/graft_ivfrebuild_${sfTag(d)}"
          rmrf(s, path)
          graft.ops.IvfIndex.build(base, path, nList = 8,
            refineIterations = 2)
          val st = graft.ops.IvfIndex.append(s, path, newCells)
          val rb = graft.ops.IvfIndex.rebuildIfStale(s, path, nList = 16,
            maxDrift = 0.05, refineIterations = 2)
          val corpus = base.unionByName(newCells)
          // TakeOrdered: a bare limit over a shuffle-derived frame is
          // not stable across the several independent actions below
          val qs = corpus.filter(col("vec_id") % 97 === 0)
            .orderBy("vec_id").limit(16)
            .select(col("vec_id").as("query_id"), col("embedding"))
          val truth = graft.ops.Similarity
            .bruteForceTopK(corpus, qs, k = 10).select("query_id", "id")
          val got = graft.ops.IvfIndex
            .topK(s, path, qs, k = 10, nProbe = 12)
            .select("query_id", "id")
          val nHit = truth.join(got, Seq("query_id", "id"), "left_semi")
            .count().toDouble
          val nTrue = truth.count().toDouble
          (st.staleness > 0.1, rb.nonEmpty,
            rb.exists(_.improvement > 0.0), nHit / nTrue >= 0.9)
        }
      Seq((drift, fired, restored, recallOk)).toDF("drift_detected",
        "rebuild_fired", "fit_restored", "recall_ok_after")
    }),

    // --- 3-column Z-order layout --------------------------------------------
    // lineitem's (l_orderkey, l_partkey, l_suppkey) triple through the
    // N-column interleave: content preserved row-for-row (hash-compared
    // against the plain projection) and the emitted z column bit-exact
    // vs the DuckDB shift/mask expression — the same contract as k18,
    // one dimension up. Layout memoized per (session, sf).
    "k20_zorder3_layout" -> ((s, d) => {
      val out = memo(zorder3Memo, s, d) { () =>
        val base = s"/tmp/graft_zorder3_${sfTag(d)}"
        rmrf(s, base)
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey")
          .write.parquet(s"$base/in")
        graft.ops.Layout.zorderCompactN(s, s"$base/in", s"$base/out",
          numFiles = 2, Seq("l_orderkey", "l_partkey", "l_suppkey"))
        s"$base/out"
      }
      s.read.parquet(out).select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"),
        graft.ops.Layout.mortonCodeN(Seq(
          col("l_orderkey").bitwiseAND(lit(255)),
          col("l_partkey").bitwiseAND(lit(255)),
          col("l_suppkey").bitwiseAND(lit(255))), 8).as("z"))
    }),

    // --- Hilbert-curve layout ------------------------------------------------
    // The same lineitem key triple through the Hilbert interleave
    // (liquid-clustering's curve): content must survive the rewrite
    // row-for-row (driver hash vs the plain projection), and the code
    // itself is cross-checked IN-GATE at data scale — bijectivity means
    // #distinct codes == #distinct masked cells, asserted once inside
    // the memo (the unit-step adjacency + exhaustive encode/decode
    // round-trip live in LayoutSpec; no SQL engine can express the
    // Gray-code transform, so the per-row code has no DuckDB oracle).
    "k21_hilbert_layout" -> ((s, d) => {
      val out = memo(hilbertMemo, s, d) { () =>
        val base = s"/tmp/graft_hilbert3_${sfTag(d)}"
        rmrf(s, base)
        t(s, d, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey")
          .write.parquet(s"$base/in")
        val back = graft.ops.Layout.hilbertCompactN(s, s"$base/in",
          s"$base/out", numFiles = 2,
          Seq("l_orderkey", "l_partkey", "l_suppkey"))
        val cells = Seq("l_orderkey", "l_partkey", "l_suppkey")
          .map(c => col(c).bitwiseAND(lit(255)))
        val agg = back
          .withColumn("__h", graft.ops.Layout.hilbertCodeN(cells, 8))
          .agg(countDistinct(col("__h")).as("codes"),
            countDistinct(cells.head, cells.tail: _*).as("cells"))
          .head()
        require(agg.getLong(0) == agg.getLong(1),
          s"hilbert code not injective on the data: ${agg.getLong(0)} " +
            s"codes for ${agg.getLong(1)} cells")
        s"$base/out"
      }
      s.read.parquet(out).select("l_orderkey", "l_partkey", "l_suppkey")
    }),

    // --- Group-wise top-k without a window funnel -----------------------------
    // Top-3 orders per customer by (totalprice, orderkey) descending —
    // the native TopKRowsAgg runs as ObjectHashAggregate with map-side
    // partials (only k-row buffers shuffle), where the row_number window
    // the oracle uses funnels every order of a customer through one
    // task. orderkey is unique, so the tie-break is total and the
    // result partitioning-independent.
    "o11_topk_per_group" -> ((s, d) =>
      graft.ops.Rank.topKPerGroup(
        t(s, d, "orders").select("o_custkey", "o_totalprice",
          "o_orderkey", "o_orderdate"),
        Seq("o_custkey"), Seq("o_totalprice", "o_orderkey"), k = 3,
        ascending = false)),

    // --- Landmark harmonic closeness ------------------------------------------
    // "How central is every part to the promoted set?" — per-landmark
    // BFS over the memoized co-purchase graph (landmarks = p_partkey %
    // 97), folded to exact integer (n_landmarks, hop_mass) and the
    // lcm-exact harmonic sum, so every column is engine-bit-exact. The
    // oracle unrolls the per-seed relaxation 12 levels (past the sf0.01
    // eccentricity of 7, where extra levels are the identity).
    "a34_closeness" -> ((s, d) => {
      val landmarks = t(s, d, "part")
        .filter(col("p_partkey") % 97 === 0)
        .select(col("p_partkey").as("seed"))
      graft.bel.Bfs.harmonicCloseness(
          Round8Queries.coPurchaseEdges(s, d), landmarks)
        .select(col("node").cast("long").as("node"), col("n_landmarks"),
          col("hop_mass"), col("harmonic"))
    }),

    // --- Corpus n-gram counts ------------------------------------------------
    // The Web-1T job: every word trigram over the corpus with its
    // occurrence count, tail pruned below minCount. One explode + one
    // map-side-combined hash aggregation; the oracle regenerates the
    // grams positionally in DuckDB over the identical normalized
    // tokenization.
    "t_ngram_counts" -> ((s, d) =>
      graft.ops.TextAnalysis.ngramCounts(
        t(s, d, "documents").select("text"), "text", n = 3,
        minCount = 2L)),

    // --- URL parsing / registrable domain ------------------------------------
    // The crawl-curation key extraction: each doc gets a deterministic
    // URL exercising userinfo, ports, mixed-case hosts, ccTLD public
    // suffixes (co.uk), empty paths and fragments; scheme/host/domain/
    // path must come back normalized. The accessor chains are RE2-safe
    // by construction, so the oracle runs them verbatim.
    "t_url_parse" -> ((s, d) => {
      import graft.ops.TextAnalysis._
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("https")).otherwise(lit("http")),
        lit("://"),
        when(col("doc_id") % 7 === 0, lit("crawler:pw@")).otherwise(lit("")),
        lit("sub"), (col("doc_id") % 13).cast("string"),
        when(col("doc_id") % 3 === 0, lit(".example.com"))
          .when(col("doc_id") % 3 === 1, lit(".data.co.uk"))
          .otherwise(lit(".Archive.ORG")),
        when(col("doc_id") % 5 === 0, lit(":8080")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(""))
          .otherwise(concat(lit("/p/"), (col("doc_id") % 11).cast("string"),
            lit(".html"))),
        lit("?q="), col("doc_id").cast("string"), lit("#frag"))
      t(s, d, "documents").select(col("doc_id"),
        urlScheme(url).as("scheme"), urlHost(url).as("host"),
        urlDomain(urlHost(url)).as("domain"), urlPath(url).as("path"))
    }),

    // --- Resample + linear interpolation --------------------------------------
    // Each user's event value (quantized to cents, the twap contract)
    // projected onto the hourly grid with straight-line interpolation
    // between bracketing observations — the continuous-signal sibling
    // of j16's forward fill. ONE window shuffle, no join; interp is an
    // exact-integer chain + one IEEE division, engine-reproducible.
    "j21_resample_interp" -> ((s, d) => {
      val obs = graft.core.Tables.events(s, d)
        .groupBy(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .agg(max(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.ops.Temporal.resampleInterp(obs, Seq("user_id"), "ts_us",
        "cents", stepUs = HourUs)
    }),

    // --- HTML/markup strip ---------------------------------------------------
    // The text-extraction step a web crawl runs before every other text
    // operator: each corpus doc is wrapped in deterministic HTML
    // scaffolding (script block with a literal '<' inside, style block,
    // per-doc attrs, entities) and stripped — script/style content must
    // vanish wholesale, tags become spaces, entities decode (&amp;
    // last), whitespace collapses. The chain is RE2-safe by design, so
    // the oracle runs the IDENTICAL regex pipeline in DuckDB.
    "t_html_strip" -> ((s, d) => {
      import graft.ops.TextAnalysis
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val html = concat(
        lit("<html><head><script type=\"text/javascript\">var x = " +
          "1 < 2 && y;</script><style>.a{color:red}</style>" +
          "</head><body id=\"b"),
        (col("doc_id") % 5).cast("string"),
        lit("\"><h1>T&amp;C &lt;terms&gt;</h1><p>"), col("text"),
        lit("</p><br/><div>&nbsp;&#39;footer&#39; &copy; 2020" +
          "</div></body></html>"))
      val clean = TextAnalysis.stripMarkup(html)
      docs.select(col("doc_id"), md5(clean).as("clean_fp"),
        length(clean).cast("long").as("n_clean"))
    }),

    // --- Embedding standardization ------------------------------------------
    // Per-dimension z-score over the corpus (the pre-PQ/IVF feature
    // scaling step): one posexplode aggregation for (mu, sigma) per
    // dimension, then a narrow transform against the broadcast-literal
    // stats. Gate emits EXPLODED (vec_id, dim, z) rows so the compare
    // sorts on the integer (dim, vec_id) prefix, never on float keys;
    // the 1e-9 relative tolerance absorbs the engines' accumulation-
    // order ulps in mu/sigma.
    "s_embed_standardize" -> ((s, d) => {
      val emb = t(s, d, "embeddings").select(col("vec_id"),
        col("embedding"))
      graft.ops.Similarity.standardize(emb)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "z")))
    }),

    // --- Behavioral-sequence fuzzy join -------------------------------------
    // Users as trajectories: each user's first 8 event-type initials in
    // (ts, event_id) order form a compact behavior string; the PassJoin
    // fuzzy join finds user pairs within edit distance 2 — "who behaves
    // alike" without a cross product. Composition of the sequence
    // build (one sort-under-aggregation, the Bpe.encode discipline)
    // with j12's operator; value-exact vs DuckDB levenshtein over the
    // same ordered string_agg.
    "j19_seq_fuzzy" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
      val traj = ev
        .groupBy("user_id")
        .agg(substring(concat_ws("",
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c"))))
            .getField("c")), 1, 8).as("s"))
      graft.ops.FuzzyJoin.fuzzyPairs(traj, "user_id", "s", maxDist = 2)
    }),

    // --- Expectation trail: metric drift across the report history ----------
    // The alerting face of continuous monitoring: the per-batch report
    // rows (batch 0 = the error-free slice, batch 1 = the full feed)
    // with each check's previous value, exact metric delta, and the
    // pass-flip flag — the domain check FLIPS when the error rows enter
    // the feed, so both the null and live flip paths are exercised.
    // One window keyed by check; value-exact vs the lag() SQL.
    "a29_expect_trail" -> ((s, d) => {
      import graft.ops.Expectations
      val ev = graft.core.Tables.events(s, d)
        .select("event_id", "user_id", "event_type", "value")
      val checks = Seq(
        Expectations.notNull("user_id"),
        Expectations.bounds("value", 0.0, 500.0),
        Expectations.valuesIn("event_type",
          Seq("view", "click", "purchase", "signup")))
      val b0 = ev.filter(col("event_type") =!= "error")
      val reports = Expectations.run(b0, checks)
        .withColumn("batch_id", lit(0L))
        .unionByName(Expectations.run(ev, checks)
          .withColumn("batch_id", lit(1L)))
      Expectations.trail(reports)
    }),

    // --- Entity resolution: fuzzy match -> clusters -> canonical ids --------
    // The batch ER composition the fuzzy join exists for: PassJoin
    // candidate pairs at edit distance <= 2 (j12's corpus: every doc
    // plus a deletion-perturbed twin) become match edges, connected
    // components merge transitive match chains, and every record maps
    // to its cluster's min id as the canonical entity (unmatched
    // records stay their own entity). Each stage is its own gated
    // operator; this pins the composition — the oracle recomputes the
    // whole chain from levenshtein + a recursive CTE.
    "j18_er_entities" -> ((s, d) => {
      val out = memo(erMemo, s, d) { () =>
        val base = t(s, d, "documents").select(
          col("doc_id").cast("long").as("id"),
          substring(col("text"), 1, 24).as("s"))
        val pfx = (col("id") % 12 + 2).cast("int")
        val pert = base.select((col("id") + 1000000L).as("id"),
          concat(col("s").substr(lit(1), pfx),
            col("s").substr(pfx + 2, lit(100))).as("s"))
        val recs = base.unionByName(pert)
        val pairs = graft.ops.FuzzyJoin.fuzzyPairs(recs, "id", "s",
          maxDist = 2)
        val cc = graft.bel.ConnectedComponents.run(
          pairs.select(col("a_id").as("src"), col("b_id").as("dst")))
        val canon = cc.groupBy("component").agg(min("node").as("ent"))
        val matched = cc.join(canon, "component")
          .select(col("node").as("id"), col("ent"))
        val p = s"/tmp/graft_er_${sfTag(d)}"
        rmrf(s, p)
        recs.select("id").join(matched, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("ent"), col("id")).as("entity_id"))
          .write.parquet(p)
        p
      }
      s.read.parquet(out)
    }),

    // --- End-to-end continuous curation -------------------------------------
    // ONE foreachBatch chain per micro-batch: expectations report →
    // curate rules (length floor + bloom decontamination) → dedup-index
    // probe → append survivors + metrics. Two time-ordered batches; the
    // second re-sends duplicate twins of first-batch content (+1e6 ids).
    // Booleans pin: corpus == the equivalent batch chain (rules then
    // exact survivors over the whole feed), twins never land, every
    // batch's report is complete, and the metrics trail sums to the
    // corpus. Each stage is its own gated primitive; this pins the
    // COMPOSITION a production ingest runs.
    "w_curate_e2e" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.ops.{Expectations, TextAnalysis}
        // memo keyed on the OUTER session: `ss` is a fresh newSession()
        // per call and would never hit
        val (eq, twins, reps, mets) = memo(curateMemo, s, d) { () =>
          val docs = t(ss, d, "documents")
          val probes = docs.filter(col("doc_id") < 5)
          val bloom = TextAnalysis.shingleBloom(probes, n = 3,
            expectedItems = 20000L, numBits = 200000L)
          def rules(in: DataFrame): DataFrame = in
            .filter(TextAnalysis.tokenCount(col("text")) >= 10)
            .filter(!TextAnalysis.bloomContaminatedFlag(col("text"),
              bloom, 3))
          val checks = Seq(Expectations.notNull("text"),
            Expectations.rowCountBetween(1L, 100000000L))
          val feed = docs
            .filter(col("doc_id") >= 5 && col("doc_id") % 10 === 0)
            .select("doc_id", "text")
          val rows = feed.as[(Long, String)].collect().sortBy(_._1)
          val b1 = rows.filter(_._1 % 20 == 0)
          val b2 = (rows.filter(_._1 % 20 != 0) ++
            b1.map { case (i, txt) => (i + 1000000L, txt) }).sortBy(_._1)
          val base = s"/tmp/graft_curate_e2e_${sfTag(d)}"
          rmrf(ss, base)
          val mem = MemoryStream[(Long, String)]
          val q = graft.streaming.CuratePipeline.run(
            mem.toDS().toDF("doc_id", "text"), checks, rules,
            s"$base/idx", s"$base/out", s"$base/ckpt")
          try {
            mem.addData(b1: _*); q.processAllAvailable()
            mem.addData(b2: _*); q.processAllAvailable()
          } finally q.stop()
          val corpusIds = graft.streaming.CuratePipeline
            .corpus(ss, s"$base/out")
            .select("doc_id").as[Long].collect().toSet
          val want = graft.ops.Dedup.exactSurvivors(rules(feed))
            .select("survivor_id").as[Long].collect().toSet
          val reports = graft.streaming.CuratePipeline
            .reports(ss, s"$base/out")
          val repOk = reports.count() == 2L * checks.length &&
            reports.filter(!col("passed")).count() == 0L
          val accSum = graft.streaming.CuratePipeline
            .metrics(ss, s"$base/out")
            .agg(sum("n_accepted")).as[Long].head()
          (corpusIds == want, corpusIds.forall(_ < 1000000L),
            repOk, accSum == corpusIds.size.toLong)
        }
        Seq((eq, twins, reps, mets)).toDF("stream_equals_batch",
          "twins_dropped", "reports_complete", "metrics_consistent")
      }))

  /** The PPR recurrence unrolled to chained CTEs with per-node restart
    * mass — [[Round7Queries]]' pagerankOracle generalized: `sv` carries
    * the normalized seed distribution and every step teleports to it. */
  private def pprOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, sum(r.rank / o.deg) AS c
         |  FROM edges e
         |  JOIN r${i - 1} r ON r.node = e.src
         |  JOIN outdeg o ON o.src = e.src
         |  GROUP BY e.dst
         |), d$i AS (
         |  SELECT coalesce(sum(r.rank), 0) AS m FROM r${i - 1} r
         |  LEFT JOIN outdeg o ON r.node = o.src WHERE o.src IS NULL
         |), r$i AS (
         |  SELECT v.node,
         |    (1 - 0.85) * v.s + 0.85 * (coalesce(c.c, 0) + d$i.m * v.s)
         |      AS rank
         |  FROM sv v CROSS JOIN d$i
         |  LEFT JOIN c$i c ON c.node = v.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT 'r:' || n_regionkey AS src, 'n:' || n_nationkey AS dst
       |    FROM nation
       |    UNION ALL
       |    SELECT 'n:' || s_nationkey, 's:' || s_suppkey FROM supplier)
       |), vertices AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
       |), sv AS (
       |  SELECT node, CASE node WHEN 'r:0' THEN 3.0 / 4.0
       |    WHEN 'r:1' THEN 1.0 / 4.0 ELSE 0.0 END AS s
       |  FROM vertices
       |), outdeg AS (
       |  SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
       |), r0 AS (
       |  SELECT node, s AS rank FROM sv
       |),
       |$steps
       |SELECT node, rank FROM r$iters
       |""".stripMargin
  }

  /** The synchronous LPA recurrence unrolled: per round, each node's
    * neighbor-label counts then the (count desc, label asc) row_number
    * winner, previous label kept when a node has no neighbors. The CTE
    * prefix is shared with the modularity oracle (which scores l5). */
  private def lpaCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.u AS node, l.label, count(*) AS cnt
         |  FROM und e JOIN l${i - 1} l ON l.node = e.v
         |  GROUP BY 1, 2
         |), b$i AS (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (
         |      PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
         |    FROM c$i)
         |  WHERE rn = 1
         |), l$i AS (
         |  SELECT l.node, coalesce(b.label, l.label) AS label
         |  FROM l${i - 1} l LEFT JOIN b$i b ON b.node = l.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""edges AS (
       |  SELECT 's:' || s_suppkey AS src, 'n:' || s_nationkey AS dst
       |  FROM supplier
       |  UNION ALL
       |  SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
       |), und AS (
       |  SELECT DISTINCT u, v FROM (
       |    SELECT src AS u, dst AS v FROM edges
       |    UNION SELECT dst AS u, src AS v FROM edges)
       |  WHERE u <> v
       |), vertices AS (
       |  SELECT DISTINCT u AS node FROM und
       |), l0 AS (
       |  SELECT node, node AS label FROM vertices
       |),
       |$steps""".stripMargin
  }

  private def lpaOracle(iters: Int): String =
    s"WITH ${lpaCtes(iters)}\nSELECT node, label FROM l$iters\n"

  /** Components of supplier→nation ∪ nation→region ∪ customer→nation —
    * shared verbatim by the batch-fold (`a28_cc_index_persist`) and
    * streaming (`w_stream_cc`) faces of the persisted label index. */
  private val ccUnionOracle: String =
      """WITH edges AS (
        |  SELECT 's:' || s_suppkey AS src, 'n:' || s_nationkey AS dst
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        |  UNION ALL
        |  SELECT 'c:' || c_custkey, 'n:' || c_nationkey FROM customer
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
        |""".stripMargin

  /** The WEIGHTED recurrence unrolled — [[pprOracle]]'s sibling on the
    * transition side: contribution rank·w/out-strength, uniform
    * restart. */
  private def weightedPrOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node, sum(r.rank * e.w / o.s) AS c
         |  FROM edges e
         |  JOIN r${i - 1} r ON r.node = e.src
         |  JOIN outstr o ON o.src = e.src
         |  GROUP BY e.dst
         |), d$i AS (
         |  SELECT coalesce(sum(r.rank), 0) AS m FROM r${i - 1} r
         |  LEFT JOIN outstr o ON r.node = o.src WHERE o.src IS NULL
         |), r$i AS (
         |  SELECT v.node,
         |    (1 - 0.85) / nn.n + 0.85 * (coalesce(c.c, 0) + d$i.m / nn.n)
         |      AS rank
         |  FROM vertices v CROSS JOIN nn CROSS JOIN d$i
         |  LEFT JOIN c$i c ON c.node = v.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS (
       |  SELECT 's:' || s_suppkey AS src, 'n:' || s_nationkey AS dst,
       |    CAST(s_suppkey % 7 + 1 AS DOUBLE) AS w
       |  FROM supplier
       |  UNION ALL
       |  SELECT 'n:' || n_nationkey, 'r:' || n_regionkey,
       |    CAST(n_nationkey % 3 + 1 AS DOUBLE)
       |  FROM nation
       |), edges AS (
       |  SELECT src, dst, sum(w) AS w FROM raw GROUP BY 1, 2
       |), vertices AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
       |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
       |outstr AS (
       |  SELECT src, sum(w) AS s FROM edges GROUP BY src
       |), r0 AS (
       |  SELECT node, 1.0 / nn.n AS rank FROM vertices CROSS JOIN nn
       |),
       |$steps
       |SELECT node, rank FROM r$iters
       |""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "a32_pagerank_weighted" -> weightedPrOracle(8),

    "a28_cc_index_persist" -> ccUnionOracle,

    "w_stream_cc" -> ccUnionOracle,

    "a30_ppr" -> pprOracle(8),

    "a31_lpa" -> lpaOracle(5),

    "a33_modularity" ->
      (s"""WITH ${lpaCtes(5)},
        |lab AS (SELECT node, label FROM l5),
        |deg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY u),
        |mm AS (SELECT count(*) / 2 AS m FROM und),
        |intra AS (
        |  SELECT la.label AS label, count(*) / 2 AS l_c
        |  FROM und e
        |  JOIN lab la ON la.node = e.u
        |  JOIN lab lb ON lb.node = e.v
        |  WHERE la.label = lb.label
        |  GROUP BY 1
        |), dsum AS (
        |  SELECT l.label, count(*) AS n_nodes, sum(d.deg) AS d_c
        |  FROM deg d JOIN lab l ON l.node = d.node GROUP BY 1
        |)
        |SELECT ds.label, ds.n_nodes, coalesce(i.l_c, 0.0) AS l_c,
        |  CAST(ds.d_c AS DOUBLE) AS d_c,
        |  coalesce(i.l_c, 0.0) / mm.m -
        |    (CAST(ds.d_c AS DOUBLE) / (2.0 * mm.m)) *
        |    (CAST(ds.d_c AS DOUBLE) / (2.0 * mm.m)) AS q_c
        |FROM dsum ds
        |LEFT JOIN intra i ON i.label = ds.label
        |CROSS JOIN mm
        |""").stripMargin,

    "t_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><script type="text/javascript">var x = 1 < 2 && y;</script><style>.a{color:red}</style></head><body id="b'
        |    || CAST(doc_id % 5 AS VARCHAR)
        |    || '"><h1>T&amp;C &lt;terms&gt;</h1><p>' || text
        |    || '</p><br/><div>&nbsp;&#39;footer&#39; &copy; 2020</div></body></html>'
        |      AS html
        |  FROM documents
        |), s1 AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(html,
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM h
        |), s2 AS (
        |  SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t
        |  FROM s1
        |), s3 AS (
        |  SELECT doc_id, replace(replace(replace(replace(replace(replace(
        |    t, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
        |  FROM s2
        |), s4 AS (
        |  SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS t
        |  FROM s3
        |)
        |SELECT doc_id, md5(t) AS clean_fp, CAST(len(t) AS BIGINT) AS n_clean
        |FROM s4
        |""".stripMargin,

    "s_embed_standardize" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS e,
        |    unnest(generate_series(1, len(embedding))) AS dimp
        |  FROM embeddings
        |), st AS (
        |  SELECT dimp, avg(e) AS mu, stddev_pop(e) AS sigma
        |  FROM x GROUP BY 1
        |)
        |SELECT x.vec_id, CAST(x.dimp - 1 AS INT) AS dim,
        |  CASE WHEN st.sigma = 0 THEN 0.0
        |    ELSE (x.e - st.mu) / st.sigma END AS z
        |FROM x JOIN st USING (dimp)
        |""".stripMargin,

    "j19_seq_fuzzy" ->
      """WITH traj AS (
        |  SELECT user_id AS id,
        |    substr(string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY ts, event_id), 1, 8) AS s
        |  FROM events GROUP BY user_id
        |)
        |SELECT a.id AS a_id, b.id AS b_id,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM traj a JOIN traj b
        |  ON (len(a.s) < len(b.s) OR (len(a.s) = len(b.s) AND a.id < b.id))
        |WHERE levenshtein(a.s, b.s) <= 2
        |""".stripMargin,

    "a29_expect_trail" ->
      """WITH b0 AS (SELECT * FROM events WHERE event_type <> 'error'),
        |r AS (
        |  SELECT 'not_null(user_id)' AS chk, 0 AS bid,
        |    CAST(count(user_id) AS DOUBLE) / count(*) AS metric,
        |    count(user_id) = count(*) AS passed FROM b0
        |  UNION ALL
        |  SELECT 'not_null(user_id)', 1,
        |    CAST(count(user_id) AS DOUBLE) / count(*),
        |    count(user_id) = count(*) FROM events
        |  UNION ALL
        |  SELECT 'bounds(value,0.0,500.0)', 0,
        |    CAST(count(*) FILTER (value BETWEEN 0 AND 500) AS DOUBLE)
        |      / count(value),
        |    count(*) FILTER (value BETWEEN 0 AND 500) = count(value)
        |  FROM b0
        |  UNION ALL
        |  SELECT 'bounds(value,0.0,500.0)', 1,
        |    CAST(count(*) FILTER (value BETWEEN 0 AND 500) AS DOUBLE)
        |      / count(value),
        |    count(*) FILTER (value BETWEEN 0 AND 500) = count(value)
        |  FROM events
        |  UNION ALL
        |  SELECT 'values_in(event_type)', 0,
        |    avg(CASE WHEN event_type IN ('view', 'click', 'purchase',
        |      'signup') THEN CAST(1 AS DOUBLE) ELSE 0 END),
        |    count(*) FILTER (event_type IN ('view', 'click', 'purchase',
        |      'signup')) = count(event_type)
        |  FROM b0
        |  UNION ALL
        |  SELECT 'values_in(event_type)', 1,
        |    avg(CASE WHEN event_type IN ('view', 'click', 'purchase',
        |      'signup') THEN CAST(1 AS DOUBLE) ELSE 0 END),
        |    count(*) FILTER (event_type IN ('view', 'click', 'purchase',
        |      'signup')) = count(event_type)
        |  FROM events
        |)
        |SELECT chk AS "check", CAST(bid AS BIGINT) AS batch_id, metric,
        |  lag(metric) OVER w AS prev_metric,
        |  metric - lag(metric) OVER w AS delta,
        |  coalesce(passed <> lag(passed) OVER w, false) AS flipped,
        |  passed
        |FROM r
        |WINDOW w AS (PARTITION BY chk ORDER BY bid)
        |""".stripMargin,

    "j18_er_entities" ->
      """WITH base AS (
        |  SELECT CAST(doc_id AS BIGINT) AS id, substr(text, 1, 24) AS s
        |  FROM documents
        |), pert AS (
        |  SELECT b.id + 1000000 AS id,
        |    substr(b.s, 1, CAST(b.id % 12 + 2 AS INT)) ||
        |      substr(b.s, CAST(b.id % 12 + 4 AS INT)) AS s
        |  FROM base b
        |), u AS (SELECT * FROM base UNION ALL SELECT * FROM pert
        |), pairs AS (
        |  SELECT a.id AS a_id, b.id AS b_id
        |  FROM u a JOIN u b
        |    ON (len(a.s) < len(b.s) OR (len(a.s) = len(b.s) AND a.id < b.id))
        |  WHERE levenshtein(a.s, b.s) <= 2
        |), und AS (
        |  SELECT DISTINCT eu, ev FROM (
        |    SELECT a_id AS eu, b_id AS ev FROM pairs
        |    UNION SELECT b_id, a_id FROM pairs)
        |  WHERE eu <> ev
        |), verts AS (
        |  SELECT DISTINCT eu AS n0 FROM und
        |), walk AS (
        |  WITH RECURSIVE walk(n, comp) AS (
        |    SELECT n0, n0 FROM verts
        |    UNION
        |    SELECT e.ev, walk.comp FROM walk JOIN und e ON walk.n = e.eu
        |  )
        |  SELECT n, comp FROM walk
        |), ent AS (
        |  SELECT n AS id, min(comp) AS entity_id FROM walk GROUP BY n
        |)
        |SELECT u.id, coalesce(e.entity_id, u.id) AS entity_id
        |FROM u LEFT JOIN ent e ON e.id = u.id
        |""".stripMargin,

    "s_ivf_rebuild" ->
      ("SELECT true AS drift_detected, true AS rebuild_fired, " +
        "true AS fit_restored, true AS recall_ok_after"),

    "k20_zorder3_layout" -> {
      val terms = (0 until 8).flatMap { i =>
        Seq(
          s"(((((l_orderkey & 255) >> $i) & 1) << ${3 * i}))",
          s"(((((l_partkey & 255) >> $i) & 1) << ${3 * i + 1}))",
          s"(((((l_suppkey & 255) >> $i) & 1) << ${3 * i + 2}))")
      }.mkString(" | ")
      "SELECT l_orderkey, l_partkey, l_suppkey, " +
        s"CAST($terms AS BIGINT) AS z FROM lineitem"
    },

    "k21_hilbert_layout" ->
      "SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem",

    "o11_topk_per_group" ->
      """SELECT o_custkey, o_totalprice, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_totalprice, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn <= 3
        |""".stripMargin,

    "a34_closeness" -> closenessOracle(12),

    "t_ngram_counts" ->
      """WITH w AS (
        |  SELECT list_filter(string_split(lower(trim(regexp_replace(
        |    text, '\s+', ' ', 'g'))), ' '), x -> x <> '') AS tk
        |  FROM documents
        |), g AS (
        |  SELECT tk, unnest(generate_series(1, len(tk) - 2)) AS i
        |  FROM w WHERE len(tk) >= 3
        |)
        |SELECT tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM g GROUP BY 1 HAVING count(*) >= 2
        |""".stripMargin,

    "t_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
        |    || '://'
        |    || (CASE WHEN doc_id % 7 = 0 THEN 'crawler:pw@' ELSE '' END)
        |    || 'sub' || CAST(doc_id % 13 AS VARCHAR)
        |    || (CASE WHEN doc_id % 3 = 0 THEN '.example.com'
        |             WHEN doc_id % 3 = 1 THEN '.data.co.uk'
        |             ELSE '.Archive.ORG' END)
        |    || (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN ''
        |        ELSE '/p/' || CAST(doc_id % 11 AS VARCHAR) || '.html' END)
        |    || '?q=' || CAST(doc_id AS VARCHAR) || '#frag' AS url
        |  FROM documents
        |), h AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_replace(regexp_replace(
        |      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |      '^[^@/]*@', ''), ':[0-9]*$', '')) AS host,
        |    regexp_extract(url,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS p
        |  FROM u
        |), dm AS (
        |  SELECT doc_id, scheme, host,
        |    CASE WHEN p = '' THEN '/' ELSE p END AS path,
        |    CASE WHEN regexp_matches(host,
        |        '\.(co|com|org|net|ac|gov|edu)\.[a-z][a-z]$')
        |      THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
        |      ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1) END AS d
        |  FROM h
        |)
        |SELECT doc_id, scheme, host,
        |  CASE WHEN len(d) > 0 THEN d ELSE host END AS domain, path
        |FROM dm
        |""".stripMargin,

    "j21_resample_interp" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    max(CAST(round(value * 100) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2
        |), seg AS (
        |  SELECT user_id, ts_us, v,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS nxt,
        |    lead(v) OVER (PARTITION BY user_id ORDER BY ts_us) AS nv
        |  FROM o
        |), st AS (
        |  SELECT user_id, ts_us, v, nxt, nv,
        |    ((ts_us + 3599999999) // 3600000000) AS i0,
        |    ((nxt - 1) // 3600000000) AS i1
        |  FROM seg WHERE nxt IS NOT NULL AND nxt > ts_us
        |), g AS (
        |  SELECT user_id, ts_us, v, nxt, nv,
        |    unnest(generate_series(i0, i1)) * 3600000000 AS grid_ts
        |  FROM st WHERE i0 <= i1
        |)
        |SELECT user_id, grid_ts,
        |  CAST(v AS DOUBLE) + CAST((nv - v) * (grid_ts - ts_us) AS DOUBLE)
        |    / CAST(nxt - ts_us AS DOUBLE) AS interp
        |FROM g
        |UNION ALL
        |SELECT user_id, ts_us AS grid_ts, CAST(v AS DOUBLE) AS interp
        |FROM seg WHERE nxt IS NULL AND ts_us % 3600000000 = 0
        |""".stripMargin,

    "w_curate_e2e" ->
      ("SELECT true AS stream_equals_batch, true AS twins_dropped, " +
        "true AS reports_complete, true AS metrics_consistent"))
}
