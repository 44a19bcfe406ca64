package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 extension gates — the r11 verdict's asks:
  *
  *  - `s_mutual_nn_ann`: HONEST recall/precision of the scale-safe
  *    mutual-NN path ([[graft.ops.Similarity.mutualTopOneAnn]] — IVF-
  *    probed top-1 → reciprocal semi-join, no corpus broadcast, no
  *    nested-loop product) against the brute-force mutual pairs over
  *    the RAW embeddings corpus at a stated nList/nProbe budget — the
  *    s_ivf_bench_recall posture extended to the pair level, so the
  *    registered ANN operator cannot pass on planted-twin invariants
  *    alone. (`s_mutual_nn` itself is re-pointed at the ANN path; the
  *    plan pin lives in MutualNnPlanSpec.)
  *  - `a45_scc`: strongly connected components
  *    ([[graft.bel.Scc]], min-label forward-backward peeling on the
  *    dict-encoded loop scaffolding) — value-exact vs a recursive-CTE
  *    mutual-reachability oracle on a directed feed WITH genuine
  *    cycles, labels canonicalized to the min member (the a13
  *    discipline).
  *  - `w_seasonal_anomaly`: events scored against their (key,
  *    hour-of-day) baseline ([[graft.ops.Anomaly.flagSeasonal]] over
  *    [[graft.ops.Temporal.seasonalProfile]]) — decimal(38,0) sigma
  *    algebra, bit-exact vs the HUGEINT window SQL; ONE broadcast
  *    join, the corpus never shuffles.
  *  - `w_stream_seasonal`: the STREAMING face
  *    ([[graft.streaming.SeasonalStream]]) — profile maintained as
  *    per-batch moment partitions (the w_stream_pca provenance
  *    discipline), folded at read, then a STATELESS stream-static
  *    broadcast scoring pass; same SQL oracle as the batch face on the
  *    same feed subset.
  *  - `a46_weighted_betweenness`: weighted Brandes
  *    ([[graft.bel.Bfs.weightedBetweenness]] — σ and dependency folds
  *    over the equal-cost min-plus DAG) vs the fully unrolled CTE
  *    recurrences, the a37/a38 bounded-round discipline; closes the
  *    CLI's own documented gap.
  *
  * …plus the round's own extension gates:
  *
  *  - `d_containment_pairs`: Broder near-superset containment over the
  *    shared df-capped inverted index ([[graft.ops.Dedup
  *    .containmentPairs]]) — planted prefix/extension pairs, exact vs
  *    the re-rooted shingle oracle.
  *  - `o17_group_sample`: deterministic per-group uniform k-sample
  *    ([[graft.ops.TrainingPrep.groupSample]]) — md5 draws through the
  *    bounded-heap top-k aggregate, selection-set-exact.
  *  - `o18_heavy_hitters`: Misra–Gries dominant-token summary
  *    ([[graft.ops.Profile.heavyHitters]]) — merge-order-independent
  *    MG guarantees machine-checked against exact counts.
  */
object Round12Queries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  private def sfTag(d: String): String =
    new java.io.File(d).getName.replace(".", "_")

  /** Whitespace token stream of a documents frame — the shared feed of
    * both heavy-hitters faces. */
  private def docTokens(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** The Misra–Gries contract as one boolean row — holds for EVERY
    * merge order, which is what makes an order-dependent summary
    * gateable: `hits(tok, est)` vs the exact counts of `toks`. */
  private def mgInvariants(hits: DataFrame, toks: DataFrame,
                           k: Int): DataFrame = {
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_true"))
    val total = toks.count()
    val under = hits.join(exact, Seq("tok"), "left")
      .agg(
        (count(lit(1)) > 0).as("nonempty"),
        (coalesce(sum(when(col("n_true").isNull ||
          col("est") > col("n_true"), 1L)), lit(0L)) === 0L)
          .as("never_over"),
        (coalesce(sum(when(
          (col("n_true") - col("est")) * (k + 1) > total, 1L)),
          lit(0L)) === 0L).as("within_bound"),
        (count(lit(1)) <= k).as("size_ok"))
    val missedHeavy = exact
      .filter(col("n_true") * (k + 1) > total)
      .join(hits.select("tok"), Seq("tok"), "left_anti")
      .agg((count(lit(1)) === 0L).as("heavy_present"))
    under.crossJoin(missedHeavy)
  }

  /** Memoized brute mutual-NN truth pairs per (session, sf dir) — the
    * eventsFeed/ivfBenchMemo harness discipline: the truth side of the
    * honest-recall gate is a deterministic O(N²) pass whose result
    * never changes within a session, so bench reruns pay it once. WEAK
    * keys, same leak rationale as the other memos. */
  private val mutualTruthMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Long)]]]())

  private def mutualTruthPairs(s: SparkSession, d: String,
                               corpus: DataFrame): Seq[(Long, Long)] = {
    val perDir = mutualTruthMemo.synchronized {
      var m = mutualTruthMemo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String,
          Seq[(Long, Long)]]()
        mutualTruthMemo.put(s, m)
      }
      m
    }
    perDir.computeIfAbsent(d, { _ =>
      import s.implicits._
      graft.ops.Similarity.mutualTopOne(corpus)
        .select("a", "b").as[(Long, Long)].collect().toSeq
    })
  }

  /** 40 distinct lowercase filler words appended to every 25th document
    * to plant near-superset pairs (prefix contained, resemblance
    * diluted); shared verbatim with the SQL oracle's feed. */
  private[graft] val containmentTail: String =
    (1 to 40).map(i => s" graftpad$i").mkString

  val queries: Map[String, Q] = Map[String, Q](

    // --- Mutual-NN honest recall (ANN vs brute pairs) -------------------------------
    // Pair-level recall AND precision of the registered ANN path over
    // the RAW near-uniform corpus (no planted twins): truth = the
    // exact |N|² mutual pairs (gate-harness cost, the
    // s_ivf_bench_recall truth posture), candidate = mutualTopOneAnn
    // at the STATED budget nList=16 / nProbe=13 / 3 refine iterations
    // (what honest ≥0.9 pair recall costs on this corpus — a pair
    // needs BOTH endpoints' top-1 probed). truth_nonempty pins the
    // gate against vacuous emptiness. (An a17-style AQE-off scoping was
    // MEASURED WORSE here — 6.6 s vs 3.7 s min-of-3: the 3M-candidate
    // probe join gains more from AQE's partition coalescing than it
    // pays in re-planning jobs, the a28 trade.)
    "s_mutual_nn_ann" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "embeddings").select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("embedding"))
      val truth = mutualTruthPairs(s, d, corpus).toDF("a", "b")
      val got = graft.ops.Similarity.mutualTopOneAnn(corpus,
          nList = 16, nProbe = 13, refineIterations = 3)
        .select(col("a"), col("b"), lit(1L).as("__g"))
      // ONE full-outer pass computes all three counts over ONE
      // evaluation of the ANN pipeline (separate count branches would
      // re-run it per aggregate subtree)
      truth.withColumn("__t", lit(1L))
        .join(got, Seq("a", "b"), "full_outer")
        .agg(
          coalesce(sum(col("__t") * col("__g")), lit(0L)).as("n_hit"),
          coalesce(sum(col("__t")), lit(0L)).as("n_true"),
          coalesce(sum(col("__g")), lit(0L)).as("n_got"))
        .select(
          (col("n_hit").cast("double") / col("n_true") >= 0.9)
            .as("recall_ok"),
          (col("n_hit").cast("double") / col("n_got") >= 0.9)
            .as("precision_ok"),
          (col("n_true") > 0).as("truth_nonempty"))
    }),

    // --- Strongly connected components ----------------------------------------------
    // Directed feed with genuine cycles: a sparse pseudo-random
    // functional-ish digraph over a 500-value domain (deterministic
    // arithmetic on lineitem keys — dense enough for a giant SCC,
    // sparse enough for singleton tendrils around it, so both the
    // peel and the mutual-reachability oracle are exercised on mixed
    // structure). Labels canonicalized to the min member value per
    // component (internal labels are hashes — the a13 discipline).
    "a45_scc" -> ((s, d) => {
      val edges = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 53 === 0)
        .select((col("l_partkey") % 500).as("src"),
          ((col("l_partkey") * 7 + col("l_suppkey")) % 500).as("dst"))
        .filter(col("src") =!= col("dst"))
      val scc = graft.bel.Scc.run(edges)
      val canon = scc.groupBy("component").agg(min("node").as("scc"))
      scc.join(canon, "component")
        .select(col("node").cast("long").as("node"),
          col("scc").cast("long").as("scc"))
    }),

    // --- SCC condensation (quotient DAG) ----------------------------------------------
    // The cycle-free dependency order over the same directed feed:
    // component-level edges, labels canonicalized to the min member —
    // acyclic by construction (the oracle derives it from the identical
    // mutual-reachability closure, so a cycle would mismatch loudly).
    "a45_condensation" -> ((s, d) => {
      val edges = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 53 === 0)
        .select((col("l_partkey") % 500).as("src"),
          ((col("l_partkey") * 7 + col("l_suppkey")) % 500).as("dst"))
        .filter(col("src") =!= col("dst"))
      val scc = graft.bel.Scc.run(edges)
      val canon = scc.groupBy("component").agg(min("node").as("m"))
      val labeled = scc.join(canon, "component")
        .select(col("node"), col("m").as("component"))
      graft.bel.Scc.condensation(edges, labels = Some(labeled))
        .select(col("c_src").cast("long").as("c_src"),
          col("c_dst").cast("long").as("c_dst"))
    }),

    // --- Seasonal (hour-of-day) anomaly flags — batch face ---------------------------
    // Every event scored against its (type, hour) baseline: exact
    // decimal(38,0) sigma test (DuckDB runs the identical algebra in
    // HUGEINT), profile from the same corpus, ONE broadcast join.
    "w_seasonal_anomaly" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
      graft.ops.Anomaly.flagSeasonal(ev,
          graft.ops.Temporal.seasonalProfile(ev))
        .select("event_type", "event_id", "hod", "q", "n", "s", "ss",
          "is_outlier")
    }),

    // --- Seasonal anomaly flags — streaming face -------------------------------------
    // Two loops, the production shape: (1) the profile-maintenance
    // stream lands two time-split micro-batches as provenance-keyed
    // moment partitions (the w_stream_pca replay discipline) whose
    // read-time fold must equal the batch profile bit-exactly;
    // (2) the scoring stream is STATELESS — the folded profile
    // broadcasts into a stream-static join, no state store, no
    // watermark, every row emits immediately. Every 20th event keeps
    // the feed micro-batch-sized; the oracle is the batch SQL over
    // the same subset.
    "w_stream_seasonal" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val rows = Round6Queries.eventsFeed(ss, d)
          .filter(_._1 % 20 == 0)
          .map(r => (r._1, r._2, r._4, r._5)) // (event_id, ts, type, value)
        val path = s"/tmp/graft_seasonal_stream_${sfTag(d)}"
        graft.core.Fs.delete(ss, path)
        val memP =
          MemoryStream[(Long, java.sql.Timestamp, String, Double)]
        val qP = graft.streaming.SeasonalStream.maintainProfile(
          memP.toDS().toDF("event_id", "ts", "event_type", "value"), path)
        try {
          val times = rows.map(_._2.getTime)
          val cut = times.min + (times.max - times.min) / 2
          memP.addData(rows.filter(_._2.getTime < cut): _*)
          qP.processAllAvailable()
          memP.addData(rows.filter(_._2.getTime >= cut): _*)
          qP.processAllAvailable()
        } finally qP.stop()
        val profile = graft.streaming.SeasonalStream.readProfile(ss, path)
        val memS =
          MemoryStream[(Long, java.sql.Timestamp, String, Double)]
        val out = graft.streaming.SeasonalStream.scoreStream(
          memS.toDS().toDF("event_id", "ts", "event_type", "value"),
          profile)
        val sink = s"w_stream_seasonal_${sfTag(d)}"
        ss.catalog.dropTempView(sink)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          memS.addData(rows: _*)
          q.processAllAvailable()
        } finally q.stop()
        ss.table(sink).select("event_type", "event_id", "hod", "q", "n",
          "s", "ss", "is_outlier")
      }),

    // --- Containment (near-superset) dedup pairs -------------------------------------
    // Broder containment over the df-capped inverted index: every 25th
    // document gets a planted EXTENSION (its text + a fixed 40-word
    // tail) — prefix shingles are all present in the extension, so
    // c_a_in_b = 1.0 while resemblance drops with the tail — the case
    // Jaccard dedup structurally misses. The oracle reproduces the
    // planted feed and both directed containments exactly.
    "d_containment_pairs" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val feed = docs.unionByName(
        docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(containmentTail)).as("text")))
      graft.ops.Dedup.containmentPairs(feed, n = 3, threshold = 0.9)
    }),

    // --- Deterministic per-group uniform sample --------------------------------------
    // k smallest md5 draws per group through the bounded-heap top-k
    // aggregate (groups × k rows cross the exchange, never the corpus);
    // same draw discipline as o13's priority sample, so the SQL oracle
    // reproduces the selection set exactly.
    "o17_group_sample" -> ((s, d) =>
      graft.ops.TrainingPrep.groupSample(
        t(s, d, "lineitem").select(col("l_returnflag"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("lid")),
        keys = Seq("l_returnflag"), k = 20, idCol = "lid")),

    // --- Misra–Gries heavy hitters ---------------------------------------------------
    // Bounded-memory dominant-token profile over the corpus token
    // stream. The summary's estimates legitimately vary with merge
    // order, so the gate checks the INVARIANTS that hold for every
    // order (the s_lsh_recall posture): never over-counts, error
    // within n/(k+1), every guaranteed-heavy token present, ≤ k
    // counters.
    "o18_heavy_hitters" -> ((s, d) => {
      val k = 32
      val toks = docTokens(t(s, d, "documents"))
      val hits = graft.ops.Profile.heavyHitters(
          toks.withColumn("g", lit(1)), Seq("g"), "tok", k)
        .select(explode(col("hits")).as("h"))
        .select(col("h.item").as("tok"), col("h.est").as("est"))
      mgInvariants(hits, toks, k)
    }),

    // --- Misra–Gries heavy hitters (streaming face) -----------------------------------
    // The PcaStream/SeasonalStream provenance discipline applied to MG:
    // each micro-batch lands its own ≤ k-counter summary partition;
    // the read-time sum+compact fold is a valid MG summary of the
    // whole stream (mergeable summaries), so the SAME contract
    // booleans must hold vs exact counts of the full feed.
    "w_stream_hh" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val k = 32
        val docs = t(ss, d, "documents")
          .select(col("doc_id"), col("text"))
          .as[(Long, String)].collect().toSeq
        val path = s"/tmp/graft_hh_stream_${sfTag(d)}"
        graft.core.Fs.delete(ss, path)
        val mem = MemoryStream[(Long, String)]
        val q = graft.streaming.HeavyHittersStream.maintainSummary(
          docTokens(mem.toDS().toDF("doc_id", "text")), path, "tok", k)
        try {
          val (h1, h2) = docs.partition(_._1 % 2 == 0)
          mem.addData(h1: _*); q.processAllAvailable()
          mem.addData(h2: _*); q.processAllAvailable()
        } finally q.stop()
        val hits = graft.streaming.HeavyHittersStream
          .readSummary(ss, path, k)
          .withColumnRenamed("item", "tok")
        mgInvariants(hits, docTokens(t(ss, d, "documents")), k)
      }),

    // --- HITS hubs and authorities ----------------------------------------------------
    // Kleinberg's mutual power method on the directed dimension graph
    // (a17-style AQE-off + 8-partition scoping: the 12 half-step jobs
    // on a dimension-sized graph are scheduler-bound, and AQE re-plans
    // every shuffle stage as its own job — measured on a17.)
    // (region→nation→supplier plus a sampled supplier→region back-edge
    // set, so hub/authority mass actually cycles instead of draining
    // through a DAG). 6 iterations in BOTH engines, L2 norms riding the
    // plan; doubles tolerant-compared (the a38 posture — IEEE sqrt is
    // exact, only sum order is loose).
    "a47_hits" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      def t2(n: String) = t(ss, d, n)
      val e1 = t2("nation").select(
        concat(lit("r:"), col("n_regionkey")).as("src"),
        concat(lit("n:"), col("n_nationkey")).as("dst"))
      val e2 = t2("supplier").select(
        concat(lit("n:"), col("s_nationkey")).as("src"),
        concat(lit("s:"), col("s_suppkey")).as("dst"))
      val e3 = t2("supplier")
        .filter(col("s_suppkey") % 17 === 0)
        .select(concat(lit("s:"), col("s_suppkey")).as("src"),
          concat(lit("r:"), col("s_suppkey") % 5).as("dst"))
      graft.bel.Hits.run(e1.unionByName(e2).unionByName(e3),
        iterations = 6)
    }),

    // --- Streaming cardinality profile -------------------------------------------------
    // The fold-at-read family completed for sketches: two time-split
    // micro-batches land per-key HLL states; the read-time union must
    // equal a ONE-SHOT profile of the whole feed EXACTLY (HLL registers
    // are per-bucket maxima — order-independent and idempotent), the
    // exact row counts must sum, and the estimate must sit inside the
    // a15 error contract vs the true distinct count.
    "w_stream_profile" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val rows = Round6Queries.eventsFeed(ss, d)
          .map(r => (r._1, r._2, r._3, r._4)) // (event_id, ts, user, type)
        val path = s"/tmp/graft_profile_stream_${sfTag(d)}"
        graft.core.Fs.delete(ss, path)
        val mem =
          MemoryStream[(Long, java.sql.Timestamp, Long, String)]
        val q = graft.streaming.ProfileStream.maintainStates(
          mem.toDS().toDF("event_id", "ts", "user_id", "event_type"),
          path, keyCol = "event_type", idCol = "user_id")
        try {
          val (h1, h2) = rows.partition(_._1 % 2 == 0)
          mem.addData(h1: _*); q.processAllAvailable()
          mem.addData(h2: _*); q.processAllAvailable()
        } finally q.stop()
        val folded = graft.streaming.ProfileStream
          .readEstimates(ss, path, "event_type")
          .select(col("event_type"), col("n_distinct_approx").as("f_est"),
            col("n").as("f_n"))
        val ev = graft.core.Tables.events(ss, d)
        val exact = ev.groupBy("event_type")
          .agg(count(lit(1)).as("e_n"),
            countDistinct("user_id").as("e_d"))
        folded.join(
            graft.ops.Profile.mergeHllStates(
              graft.ops.Profile.hllStates(ev, "event_type", "user_id"),
              "event_type")
              .select(col("event_type"),
                col("n_distinct_approx").as("o_est")),
            Seq("event_type"))
          .join(exact, Seq("event_type"))
          .agg(
            (count(lit(1)) > 0).as("nonempty"),
            (sum(when(col("f_n") =!= col("e_n"), 1L)).isNull ||
              coalesce(sum(when(col("f_n") =!= col("e_n"), 1L)),
                lit(0L)) === 0L).as("counts_exact"),
            (coalesce(sum(when(col("f_est") =!= col("o_est"), 1L)),
              lit(0L)) === 0L).as("fold_equals_oneshot"),
            (coalesce(sum(when(
              abs(col("f_est") - col("e_d").cast("double")) >
                col("e_d").cast("double") * 0.1, 1L)),
              lit(0L)) === 0L).as("within_error"))
      }),

    // --- Missing-data gap intervals -----------------------------------------------------
    // The sessionizer's dual over the same feed: per-user silences
    // longer than 2 hours, bounds as formatted timestamps (the
    // w_sessionize comparator discipline), spacing in exact
    // unix_timestamp seconds vs floor(epoch) — the established
    // engine-exact pair.
    "j22_gaps" -> ((s, d) =>
      graft.ops.Temporal.gaps(graft.core.Tables.events(s, d),
          minGapSeconds = 7200L)
        .select(col("user_id"),
          date_format(col("gap_start"), "yyyy-MM-dd HH:mm:ss")
            .as("gap_start"),
          date_format(col("gap_end"), "yyyy-MM-dd HH:mm:ss")
            .as("gap_end"),
          col("gap_s"))),

    // --- Weighted Brandes betweenness ------------------------------------------------
    // σ and dependency folds over the equal-cost min-plus DAG of the
    // a37 weighted co-purchase graph — 6 rounds in EACH loop (costs,
    // σ, δ), every oracle level one recurrence step, engine-identical
    // whether or not the fixpoints land inside the bound. Double δ
    // sums, the a38 tolerant-compare posture.
    "a46_weighted_betweenness" -> ((s, d) => {
      val landmarks = t(s, d, "part")
        .filter(col("p_partkey") % 97 === 0)
        .select(col("p_partkey").as("seed"))
      val edges = Round8Queries.coPurchaseEdges(s, d)
        .withColumn("w", (col("src") + col("dst")) % 7 + 1)
      graft.bel.Bfs.weightedBetweenness(edges, landmarks, "w", rounds = 6)
        .select(col("node").cast("long").as("node"), col("betweenness"))
    }))

  /** The weighted-Brandes recurrences fully unrolled — per-seed
    * weighted min-plus costs (the a37 step, keyed by seed), the
    * equal-cost DAG as one 3-way join keyed on cost, then `rounds`
    * recompute-from-predecessors σ levels and `rounds`
    * recompute-from-successors δ levels — each CTE level IS one loop
    * round of [[graft.bel.Bfs.weightedBetweenness]]. */
  private def weightedBetweennessOracle(rounds: Int): String = {
    val costs = (1 to rounds).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT seed, node, min(cost) AS cost FROM (
         |    SELECT seed, node, cost FROM c${i - 1}
         |    UNION ALL
         |    SELECT c.seed, a.v, c.cost + a.w
         |    FROM c${i - 1} c JOIN adjw a ON c.node = a.u)
         |  GROUP BY 1, 2
         |)""".stripMargin
    }.mkString(",\n")
    val sigmas = (1 to rounds).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT seed, node, sigma FROM s0
         |  UNION ALL
         |  SELECT g.seed, g.w AS node, CAST(sum(p.sigma) AS BIGINT)
         |  FROM dag g JOIN s${i - 1} p
         |    ON p.seed = g.seed AND p.node = g.v
         |  GROUP BY 1, 2
         |)""".stripMargin
    }.mkString(",\n")
    val deltas = (1 to rounds).map { i =>
      s"""del$i AS MATERIALIZED (
         |  SELECT r.seed, r.node, coalesce(c.delta, 0) AS delta
         |  FROM (SELECT seed, node FROM c$rounds) r
         |  LEFT JOIN (
         |    SELECT g.seed, g.v AS node,
         |      sum(g.ratio * (1 + p.delta)) AS delta
         |    FROM rdag g JOIN del${i - 1} p
         |      ON p.seed = g.seed AND p.node = g.w
         |    GROUP BY 1, 2) c
         |  ON c.seed = r.seed AND c.node = r.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e0 AS MATERIALIZED (
       |  SELECT a.pk AS a, b.pk AS b
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |), adjw AS MATERIALIZED (
       |  SELECT a AS u, b AS v, (a + b) % 7 + 1 AS w FROM e0
       |  UNION ALL
       |  SELECT b, a, (a + b) % 7 + 1 FROM e0
       |), c0 AS MATERIALIZED (
       |  SELECT p_partkey AS seed, p_partkey AS node,
       |    CAST(0 AS BIGINT) AS cost
       |  FROM part WHERE p_partkey % 97 = 0
       |),
       |$costs,
       |dag AS MATERIALIZED (
       |  SELECT a.seed, a.node AS v, b.node AS w
       |  FROM c$rounds a
       |  JOIN adjw ON a.node = adjw.u
       |  JOIN c$rounds b ON b.seed = a.seed AND b.node = adjw.v
       |    AND b.cost = a.cost + adjw.w
       |), s0 AS MATERIALIZED (
       |  SELECT seed, node, CAST(1 AS BIGINT) AS sigma FROM c0
       |),
       |$sigmas,
       |rdag AS MATERIALIZED (
       |  SELECT g.seed, g.v, g.w,
       |    CAST(sv.sigma AS DOUBLE) / sw.sigma AS ratio
       |  FROM dag g
       |  JOIN s$rounds sv ON sv.seed = g.seed AND sv.node = g.v
       |  JOIN s$rounds sw ON sw.seed = g.seed AND sw.node = g.w
       |), del0 AS MATERIALIZED (
       |  SELECT seed, node, CAST(0 AS DOUBLE) AS delta FROM c$rounds
       |),
       |$deltas
       |SELECT CAST(node AS BIGINT) AS node, sum(delta) AS betweenness
       |FROM del$rounds WHERE node <> seed
       |GROUP BY 1
       |""".stripMargin
  }

  private def seasonalSql(filter: String): String =
    s"""WITH b AS (
       |  SELECT event_type, event_id,
       |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hod,
       |    CAST(floor(value * 1000) AS BIGINT) AS q
       |  FROM events$filter
       |), p AS (
       |  SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(q) AS BIGINT) AS s, CAST(sum(q * q) AS BIGINT) AS ss
       |  FROM b GROUP BY 1, 2
       |)
       |SELECT b.event_type, b.event_id, b.hod, b.q, p.n, p.s, p.ss,
       |  (p.n >= 8 AND
       |   (CAST(p.n AS HUGEINT) * b.q - p.s)
       |     * (CAST(p.n AS HUGEINT) * b.q - p.s)
       |   > 9 * (CAST(p.n AS HUGEINT) * p.ss
       |     - CAST(p.s AS HUGEINT) * p.s)) AS is_outlier
       |FROM b JOIN p USING (event_type, hod)
       |""".stripMargin

  /** [[Queries.shingleCte]] re-rooted on the planted containment feed,
    * then Broder's directed containments from the same intersection
    * counts the Jaccard oracle uses. */
  private def containmentOracle: String = {
    val feed = "SELECT doc_id, text FROM documents UNION ALL " +
      s"SELECT doc_id + 1000000, text || '$containmentTail' " +
      "FROM documents WHERE doc_id % 25 = 0"
    s"""WITH feed AS ($feed),
       |${Queries.shingleCte.replace("FROM documents", "FROM feed")
            .stripPrefix("WITH ")},
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |  FROM ex a JOIN ex b ON a.shingle = b.shingle
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b, CAST(c AS BIGINT) AS n_common,
       |  CAST(c AS DOUBLE) / na.n AS c_a_in_b,
       |  CAST(c AS DOUBLE) / nb.n AS c_b_in_a
       |FROM inter
       |JOIN sizes na ON na.doc_id = id_a
       |JOIN sizes nb ON nb.doc_id = id_b
       |WHERE greatest(CAST(c AS DOUBLE) / na.n,
       |               CAST(c AS DOUBLE) / nb.n) >= 0.9
       |""".stripMargin
  }

  /** HITS unrolled: per iteration one authority join+fold+normalize
    * then one hub join+fold+normalize — each CTE level IS one
    * half-step of [[graft.bel.Hits.run]]. */
  private def hitsOracle(iterations: Int): String = {
    val steps = (1 to iterations).map { i =>
      s"""a${i}r AS MATERIALIZED (
         |  SELECT e.dst AS node, sum(h.h) AS a0
         |  FROM e JOIN h${i - 1} h ON h.node = e.src GROUP BY 1
         |), a${i}f AS MATERIALIZED (
         |  SELECT v.node, coalesce(r.a0, 0) AS a0
         |  FROM vertices v LEFT JOIN a${i}r r ON r.node = v.node
         |), a$i AS MATERIALIZED (
         |  SELECT node,
         |    CASE WHEN na > 0 THEN a0 / na ELSE 0 END AS a
         |  FROM a${i}f CROSS JOIN
         |    (SELECT sqrt(sum(a0 * a0)) AS na FROM a${i}f)
         |), h${i}r AS MATERIALIZED (
         |  SELECT e.src AS node, sum(a.a) AS h0
         |  FROM e JOIN a$i a ON a.node = e.dst GROUP BY 1
         |), h${i}f AS MATERIALIZED (
         |  SELECT v.node, coalesce(r.h0, 0) AS h0
         |  FROM vertices v LEFT JOIN h${i}r r ON r.node = v.node
         |), h$i AS MATERIALIZED (
         |  SELECT node,
         |    CASE WHEN nh > 0 THEN h0 / nh ELSE 0 END AS h
         |  FROM h${i}f CROSS JOIN
         |    (SELECT sqrt(sum(h0 * h0)) AS nh FROM h${i}f)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS MATERIALIZED (
       |  SELECT 'r:' || n_regionkey AS src, 'n:' || n_nationkey AS dst
       |  FROM nation
       |  UNION ALL
       |  SELECT 'n:' || s_nationkey, 's:' || s_suppkey FROM supplier
       |  UNION ALL
       |  SELECT 's:' || s_suppkey, 'r:' || (s_suppkey % 5)
       |  FROM supplier WHERE s_suppkey % 17 = 0
       |), e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM raw
       |), vertices AS MATERIALIZED (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
       |), h0 AS MATERIALIZED (
       |  SELECT node, CAST(1 AS DOUBLE) AS h FROM vertices
       |),
       |$steps
       |SELECT v.node, h$iterations.h AS hub, a$iterations.a AS authority
       |FROM vertices v
       |JOIN h$iterations ON h$iterations.node = v.node
       |JOIN a$iterations ON a$iterations.node = v.node
       |""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "a47_hits" -> hitsOracle(6),

    "d_containment_pairs" -> containmentOracle,

    "o17_group_sample" ->
      """WITH b AS (
        |  SELECT l_returnflag, l_orderkey * 10 + l_linenumber AS lid
        |  FROM lineitem
        |), dr AS (
        |  SELECT l_returnflag, lid,
        |    ('0x' || substring(md5(CAST(lid AS VARCHAR) ||
        |      ':group-sample'), 1, 8))::BIGINT AS draw
        |  FROM b
        |), r AS (
        |  SELECT l_returnflag, lid, draw,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY draw, lid) AS rn
        |  FROM dr
        |)
        |SELECT l_returnflag, CAST(draw AS BIGINT) AS draw,
        |  CAST(lid AS BIGINT) AS lid
        |FROM r WHERE rn <= 20
        |""".stripMargin,

    "o18_heavy_hitters" ->
      ("SELECT true AS nonempty, true AS never_over, " +
        "true AS within_bound, true AS size_ok, true AS heavy_present"),

    "w_stream_hh" ->
      ("SELECT true AS nonempty, true AS never_over, " +
        "true AS within_bound, true AS size_ok, true AS heavy_present"),

    "s_mutual_nn_ann" ->
      ("SELECT true AS recall_ok, true AS precision_ok, " +
        "true AS truth_nonempty"),

    "a45_scc" ->
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT l_partkey % 500 AS src,
        |    (l_partkey * 7 + l_suppkey) % 500 AS dst
        |  FROM lineitem
        |  WHERE l_orderkey % 53 = 0
        |    AND l_partkey % 500 <> (l_partkey * 7 + l_suppkey) % 500
        |), n AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
        |), r AS MATERIALIZED (
        |  WITH RECURSIVE reach(a, b) AS (
        |    SELECT src, dst FROM e
        |    UNION
        |    SELECT reach.a, e.dst FROM reach JOIN e ON e.src = reach.b
        |  ) SELECT a, b FROM reach
        |)
        |SELECT CAST(node AS BIGINT) AS node, CAST(min(m) AS BIGINT) AS scc
        |FROM (
        |  SELECT node, node AS m FROM n
        |  UNION ALL
        |  SELECT r1.a AS node, r1.b AS m
        |  FROM r r1 JOIN r r2 ON r2.a = r1.b AND r2.b = r1.a
        |) GROUP BY 1
        |""".stripMargin,

    "a45_condensation" ->
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT l_partkey % 500 AS src,
        |    (l_partkey * 7 + l_suppkey) % 500 AS dst
        |  FROM lineitem
        |  WHERE l_orderkey % 53 = 0
        |    AND l_partkey % 500 <> (l_partkey * 7 + l_suppkey) % 500
        |), n AS (
        |  SELECT DISTINCT node FROM (
        |    SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
        |), r AS MATERIALIZED (
        |  WITH RECURSIVE reach(a, b) AS (
        |    SELECT src, dst FROM e
        |    UNION
        |    SELECT reach.a, e.dst FROM reach JOIN e ON e.src = reach.b
        |  ) SELECT a, b FROM reach
        |), scc AS MATERIALIZED (
        |  SELECT node, min(m) AS m FROM (
        |    SELECT node, node AS m FROM n
        |    UNION ALL
        |    SELECT r1.a AS node, r1.b AS m
        |    FROM r r1 JOIN r r2 ON r2.a = r1.b AND r2.b = r1.a
        |  ) GROUP BY 1
        |)
        |SELECT DISTINCT CAST(sa.m AS BIGINT) AS c_src,
        |  CAST(sb.m AS BIGINT) AS c_dst
        |FROM e
        |JOIN scc sa ON sa.node = e.src
        |JOIN scc sb ON sb.node = e.dst
        |WHERE sa.m <> sb.m
        |""".stripMargin,

    "j22_gaps" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), l AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM e
        |)
        |SELECT user_id,
        |  strftime(prev, '%Y-%m-%d %H:%M:%S') AS gap_start,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS gap_end,
        |  CAST(floor(epoch(ts)) AS BIGINT) -
        |    CAST(floor(epoch(prev)) AS BIGINT) AS gap_s
        |FROM l
        |WHERE prev IS NOT NULL
        |  AND CAST(floor(epoch(ts)) AS BIGINT) -
        |    CAST(floor(epoch(prev)) AS BIGINT) > 7200
        |""".stripMargin,

    "w_seasonal_anomaly" -> seasonalSql(""),

    "w_stream_seasonal" -> seasonalSql(" WHERE event_id % 20 = 0"),

    "w_stream_profile" ->
      ("SELECT true AS nonempty, true AS counts_exact, " +
        "true AS fold_equals_oneshot, true AS within_error"),

    "a46_weighted_betweenness" -> weightedBetweennessOracle(6))
}
