package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-8 second-wave registrations — temporal analytics + graph
  * proximity + lexical near-dup:
  *
  *  - `a21_bfs_hops`: multi-source BFS hop distances over the memoized
  *    co-purchase part graph ([[graft.bel.Bfs]]), vs the relaxation loop
  *    unrolled to materialized DuckDB CTEs (identity past the fixpoint,
  *    the [[Round8Queries]] kcore-oracle discipline).
  *  - `a22_funnel`: ordered event-sequence conversion ([[graft.ops.Funnel]])
  *    vs chained strictly-after min-timestamp CTEs.
  *  - `j14_asof_nearest`: the nearest-direction as-of mode
  *    ([[graft.ops.Temporal.asOfJoinNearest]]) vs DuckDB's two native
  *    directional ASOF joins combined by the closest-wins/backward-ties
  *    CASE — completing the j10 mode matrix (backward, forward,
  *    tolerance × both, nearest).
  *  - `w_scd2_intervals`: SCD2 validity-interval build
  *    ([[graft.ops.Temporal.scd2]]) vs the lag-filter-lead window SQL.
  *  - `w_rolling_sum`: trailing time-range rolling aggregates
  *    ([[graft.ops.Temporal.rollingSum]]) vs the RANGE-frame window SQL —
  *    integer cents so the sums are engine-exact.
  *  - `d_cosine_pairs`: count-vector cosine near-dup pairs over word
  *    trigrams ([[graft.ops.TextSearch.cosinePairs]]) vs the brute
  *    postings self-join — every measure integer, the pair set exact.
  */
object Round8bQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val TolUs = 600000000L // 10 minutes
  private val HourUs = 3600000000L

  private def clicksUs(s: SparkSession, d: String): DataFrame = {
    val ev = graft.core.Tables.events(s, d)
    ev.filter(col("event_type") === "click")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id"))
  }

  private def errorsUs(s: SparkSession, d: String): DataFrame = {
    val ev = graft.core.Tables.events(s, d)
    ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("rts"))
      .agg(max("value").as("err_value"))
  }

  val queries: Map[String, Q] = Map[String, Q](

    // --- Multi-source BFS hop distances -------------------------------------
    // "How far is every part from the promoted set?" — seeds are the
    // p_partkey % 50 == 0 parts (graph members or not: isolated seeds
    // report hops 0), edges the ≥2-co-order co-purchase graph the kcore
    // gate memoizes. Spark runs the relaxation to its fixpoint; the
    // oracle unrolls 12 levels, enough past the sf0.01 eccentricity (7)
    // that extra levels are the identity.
    "a21_bfs_hops" -> ((s, d) => {
      val seeds = graft.core.Tables.load(s, d, "part")
        .filter(col("p_partkey") % 50 === 0)
        .select(col("p_partkey").as("seed"))
      graft.bel.Bfs.hops(Round8Queries.coPurchaseEdges(s, d), seeds)
        .select(col("node").cast("long").as("node"), col("hops"))
    }),

    // --- Ordered event-sequence (funnel) conversion -------------------------
    // view → click → purchase with strictly-increasing timestamps; the
    // operator folds each user's time-ordered stage events through the
    // chain in ONE shuffle; the oracle chains strictly-after min-ts CTEs.
    "a22_funnel" -> ((s, d) =>
      graft.ops.Funnel.reach(graft.core.Tables.events(s, d),
        Seq("view", "click", "purchase"))),

    // --- Funnel conversion-lag statistics -----------------------------------
    // Per transition (view→click, click→purchase): how many users
    // converted and how long it took — exact integer measures only
    // (count, µs sum/min/max), one pass over the per-user reach frame.
    "a27_conversion_lag" -> ((s, d) =>
      graft.ops.Funnel.transitionLags(graft.core.Tables.events(s, d),
        Seq("view", "click", "purchase"))),

    // --- As-of join: nearest direction + tolerance --------------------------
    // Nearest error state within ±10 minutes of each click; equidistant
    // candidates resolve backward (the causally safe default). Right side
    // pre-aggregated per (user, µs) so the tie winner is engine-
    // independent — the j10 discipline.
    "j14_asof_nearest" -> ((s, d) =>
      graft.ops.Temporal.asOfJoinNearest(
        clicksUs(s, d), errorsUs(s, d), Seq("user_id"),
        leftTs = "ts_us", rightTs = "rts", tolerance = Some(TolUs))),

    // --- As-of join: strict (exclude-exact-match) mode ----------------------
    // pandas allow_exact_matches=False: the last error STRICTLY before
    // each click — an equal-µs error is not admissible. Completes the
    // j10 mode matrix (backward/forward × tolerance × strict).
    "j10_asof_strict" -> ((s, d) =>
      graft.ops.Temporal.asOfJoin(
        clicksUs(s, d), errorsUs(s, d), Seq("user_id"),
        leftTs = "ts_us", rightTs = "rts", strict = true)),

    // --- SCD2 validity intervals --------------------------------------------
    // Each user's event-type state history compressed into half-open
    // [valid_from, valid_to) intervals; same-µs conflicts pre-aggregated
    // to min(event_type) so interval semantics are well-defined in both
    // engines.
    "w_scd2_intervals" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
        .groupBy(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .agg(min("event_type").as("state"))
      graft.ops.Temporal.scd2(ev, Seq("user_id"), "ts_us", "state")
    }),

    // --- EXCEPT / INTERSECT set operations ----------------------------------
    // Completes the §2.7 set-op family beside u1's UNION: clickers who
    // never purchased (EXCEPT) and clickers who did (INTERSECT), labeled
    // and unioned — distinct semantics in both engines.
    "u2_except_intersect" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
      def users(kind: String) = ev.filter(col("event_type") === kind)
        .select(col("user_id"))
      users("click").except(users("purchase"))
        .withColumn("set_label", lit("click_only"))
        .unionByName(users("click").intersect(users("purchase"))
          .withColumn("set_label", lit("both")))
    }),

    // --- Equi-depth binning + rank statistics -------------------------------
    // ntile(10) and percent_rank per event type over integer cents, the
    // ordering made unique by (cents, event_id) so both window functions
    // are deterministic; percent_rank is a single division of exact ints.
    // Summarized per (type, bin): counts + cent bounds + the bin's top
    // percent_rank — the equi-depth histogram every profiler needs.
    "o10_ntile" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type")
        .orderBy(col("cents").asc, col("event_id").asc)
      ev.withColumn("bin", ntile(10).over(w).cast("long"))
        .withColumn("pr", percent_rank().over(w))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"), min("cents").as("lo"),
          max("cents").as("hi"), max("pr").as("top_pr"))
    }),

    // --- SCD2 + as-of composition: state valid at event time ----------------
    // The feature-store enrichment the two operators exist for: build the
    // per-user state history (scd2), then each purchase picks the
    // interval containing its instant — which for tiling intervals is
    // exactly the backward as-of on valid_from, so the enrich costs ONE
    // window pass, not an interval join. Oracle = the raw half-open
    // interval-containment join.
    "j15_scd2_enrich" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
        .groupBy(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .agg(min("event_type").as("state"))
      val dim = graft.ops.Temporal.scd2(ev, Seq("user_id"), "ts_us", "state")
        .select(col("user_id"), col("valid_from"), col("state"))
      val purchases = graft.core.Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      graft.ops.Temporal.asOfJoin(purchases, dim, Seq("user_id"),
        leftTs = "ts_us", rightTs = "valid_from")
    }),

    // --- Trailing time-range rolling aggregates -----------------------------
    // Per user: click count + spend (integer cents) over the trailing
    // hour, evaluated at every click — RANGE frame, both ends inclusive,
    // equal-µs peers share the frame in both engines.
    "w_rolling_sum" -> ((s, d) => {
      val clicks = graft.core.Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      graft.ops.Temporal.rollingSum(clicks, Seq("user_id"), "ts_us",
        "cents", HourUs)
    }),

    // --- Count-vector cosine near-dup pairs ---------------------------------
    // Word-trigram tf vectors (the sparse unit for this corpus's 31-word
    // vocabulary), df cap 50, cosine ≥ 1/2 — the planted near-dup
    // families pair up; every emitted measure is an integer so the gate
    // is value-exact, not approximate.
    "d_cosine_pairs" -> ((s, d) =>
      graft.ops.TextSearch.cosinePairs(
        graft.core.Tables.load(s, d, "documents"),
        num = 1, den = 2, dfCap = 50, ngram = 3)),

    // --- Cohort retention triangle ------------------------------------------
    // Users cohorted by first-activity ISO week, counted distinct in
    // every week they return — ONE shuffle on the user key (cohort min +
    // activity-week set in the same pass), the calendar bounds per-user
    // state.
    "a23_retention" -> ((s, d) =>
      graft.ops.Cohort.retention(graft.core.Tables.events(s, d))),

    // --- ROLLUP multi-level aggregation -------------------------------------
    // Customer counts + balance cents by (nation, segment) with subtotal
    // and grand-total levels — the nation dim broadcasts, cents keep the
    // sums integer-exact across the NULL-marked rollup levels.
    "a24_rollup" -> ((s, d) => {
      val cust = graft.core.Tables.load(s, d, "customer")
      val nat = graft.core.Tables.load(s, d, "nation")
      // GROUP BY ROLLUP via SQL over the joined view: the DataFrame
      // `.rollup` API after ANY join trips Spark 4.1's
      // ambiguous-self-join check (the Expand duplicates grouping attrs);
      // the SQL form plans the identical Aggregate(Expand) without the
      // false positive, and the broadcast hint survives the temp view
      cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_mktsegment"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
        .createOrReplaceTempView("graft_rollup_in")
      s.sql("""SELECT n_name, c_mktsegment, count(*) AS n_cust,
        sum(cents) AS bal_cents
        FROM graft_rollup_in GROUP BY ROLLUP (n_name, c_mktsegment)""")
    }),

    // --- PIVOT: per-user event-type counts as columns -----------------------
    // The explicit value list keeps the pivot a single pass (no
    // distinct-values pre-query); absent combinations fill 0 so the
    // frame matches the CASE-sum oracle exactly.
    "a25_pivot" -> ((s, d) =>
      graft.core.Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // --- Partition-pruned layout: write partitionBy, read one partition -----
    // The lang='en' read must touch only the en/ directory (the spec pins
    // PartitionFilters); the gate value-checks the partition-column
    // round-trip against the unpartitioned oracle scan.
    "k15_partitioned_layout" -> ((s, d) => {
      val out = memoizedLayout(s, s"$d#partitioned") { () =>
        val p = s"/tmp/graft_part_layout_${sfTag(d).replace(".", "_")}"
        graft.core.Tables.load(s, d, "documents")
          .write.mode("overwrite").partitionBy("lang").parquet(p)
        p
      }
      s.read.parquet(out).filter(col("lang") === "en")
        .groupBy("source").agg(count(lit(1)).as("n"),
          sum("n_chars").as("chars"))
    }),

    // --- Compaction: N sorted files, content row-for-row preserved ----------
    // Small-file hygiene as an operator: the documents directory rewritten
    // as 2 doc_id-sorted files (row-group stats tighten); the gate re-reads
    // the compacted layout and must hash-match the original table exactly.
    "k16_compacted" -> ((s, d) => {
      val out = memoizedLayout(s, s"$d#compacted") { () =>
        val p = s"/tmp/graft_compacted_${sfTag(d).replace(".", "_")}"
        graft.ops.Layout.compact(s, s"$d/documents.parquet", p,
          numFiles = 2, Seq("doc_id"))
        p
      }
      s.read.parquet(out)
        .select("doc_id", "text", "lang", "source", "n_chars")
    }),

    // --- Z-order (Morton) clustered layout ----------------------------------
    // Multi-dimensional compaction: documents range-partitioned and
    // sorted by the (doc_id, n_chars) bit-interleave, so min/max stats
    // prune range predicates on EITHER column. The gate re-reads the
    // clustered layout and re-derives every row's Morton code — content
    // AND the interleave arithmetic are value-exact vs the oracle.
    "k18_zorder_layout" -> ((s, d) => {
      val out = memoizedLayout(s, s"$d#zorder") { () =>
        val p = s"/tmp/graft_zorder_${sfTag(d).replace(".", "_")}"
        graft.ops.Layout.zorderCompact(s, s"$d/documents.parquet", p,
          numFiles = 2, "doc_id", "n_chars")
        p
      }
      s.read.parquet(out)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"),
          graft.ops.Layout.mortonCode(col("doc_id").bitwiseAND(lit(255)),
            col("n_chars").bitwiseAND(lit(255))).as("z"))
    }),

    // --- JSONL export: loader-facing gzipped shards, schema-pinned ----------
    // The interchange sink training loaders consume; the gate re-reads the
    // shards with the PINNED schema (JSON carries no types) and must
    // hash-match the source projection — a lossy or re-typed round-trip
    // fails the gate.
    "k17_jsonl_export" -> ((s, d) => {
      val out = memoizedLayout(s, s"$d#jsonl") { () =>
        val p = s"/tmp/graft_jsonl_${sfTag(d).replace(".", "_")}"
        graft.ops.Layout.exportJsonl(
          graft.core.Tables.load(s, d, "documents")
            .select("doc_id", "lang", "text"),
          p, shards = 3)
        p
      }
      s.read.schema("doc_id BIGINT, lang STRING, text STRING").json(out)
    }),

    // --- Corpus drift report between snapshots ------------------------------
    // "The new crawl landed — did the distribution move?" Snapshot A =
    // even doc ids, snapshot B = odd; per language: vocab sizes, words
    // new/vanished, token volumes, L1 count-vector distance — all exact
    // integers, one full-outer equi-join on (lang, word).
    "t_drift_report" -> ((s, d) => {
      val docs = graft.core.Tables.load(s, d, "documents")
      graft.ops.TextAnalysis.driftReport(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1))
    }),

    // --- Deterministic random walks (embedding-corpus generator) ------------
    // DeepWalk-posture walks over the co-purchase graph: step t of walk w
    // moves to the neighbor minimizing (md5(w:t:v), v) — hash-seeded,
    // partitioning/engine-independent, so the walk corpus is reproducible
    // and the oracle (per-step row_number argmin, unrolled) exact.
    "g10_random_walks" -> ((s, d) =>
      graft.bel.RandomWalks.walks(Round8Queries.coPurchaseEdges(s, d),
        steps = 4)),

    // --- Skip-gram (center, context) pairs from the walk corpus -------------
    // The embedder-input hop: ordered position pairs within a ±2 band
    // per walk, aggregated to counts — self-join on walk_id only, fan-out
    // bounded by 2·window·(steps+1) per walk.
    "g12_skipgram_pairs" -> ((s, d) =>
      graft.bel.RandomWalks.skipGramPairs(
        graft.bel.RandomWalks.walks(Round8Queries.coPurchaseEdges(s, d),
          steps = 4),
        window = 2)),

    // --- Deterministic KG negative sampling ---------------------------------
    // Corrupt-object negatives for the (order)-[contains]->(part) triple
    // set (every 20th order): entities bucket by salted md5, each
    // (triple, slot) draws from ONE bucket, argmin picks the candidate,
    // a LEFT ANTI join removes any drawn true triple. Same negatives
    // every run, every engine. Bucket count scales with the entity set
    // (target bucket size ~32): a FIXED small bucket count is the
    // anti-pattern — 16 distinct join keys over 20k entities planned 16
    // skewed sort-merge groups and 75M buffered candidates (132 s at
    // sf0.1); |E|/32 buckets keeps the join key space wide and per-slot
    // fan-out constant, independent of corpus scale.
    "g11_negative_samples" -> ((s, d) => {
      val triples = graft.core.Tables.load(s, d, "lineitem")
        .filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("s"), lit("contains").as("r"),
          col("l_partkey").as("o"))
        .distinct()
      val entities = graft.core.Tables.load(s, d, "part")
        .select(col("p_partkey").as("e"))
      // dimension-sized driver count (the part table), mirrored exactly
      // by the oracle's scalar subquery
      val buckets = math.max(16L, entities.distinct().count() / 32L).toInt
      graft.bel.NegativeSampling.corruptObjects(triples, entities,
        k = 2, buckets = buckets)
    }),

    // --- Perceptual image near-dup pairs (dHash through the real decoder) ---
    // Image-dataset dedup: synthetic P6 corpus + exact-duplicate twins
    // under shifted ids; every planted twin must pair at Hamming 0 (the
    // banding is pigeonhole-complete), everything emitted must sit within
    // the radius, and the pair set must be non-vacuous. Hash values are
    // engine-internal, so the gate is a hard boolean invariant — the
    // d_simhash_pairs discipline. The corpus is CAPPED at 500 base
    // images: the synthetic generator's image space is tiny (4-8 × 3-6
    // px), so at larger corpora thousands of documents collapse onto the
    // same hash and the identical-hash groups make the PAIR SET itself
    // quadratic — a property of the synthetic corpus, not the operator;
    // the invariants under test are size-independent.
    "mm_dhash_pairs" -> ((s, d) => {
      val ids = graft.core.Tables.load(s, d, "documents")
        .select(col("doc_id"))
        .filter(col("doc_id") < 500)
      val base = graft.ops.Multimodal.ppmEncode(ids)
      val twins = base.select((col("doc_id") + 2000000L).as("doc_id"),
        col("content"))
      val pairs = graft.ops.Multimodal.imageNearDupPairs(
        base.unionByName(twins), maxHamming = 2)
      pairs.agg(
        sum(when(col("id_b") === col("id_a") + 2000000L &&
          col("hamming") === 0, 1L).otherwise(0L)).as("planted0"),
        max("hamming").as("maxham"),
        count(lit(1)).as("n_pairs"))
        .crossJoin(ids.agg(count(lit(1)).as("n_docs")))
        .select(
          (col("planted0") === col("n_docs")).as("planted_all_recovered"),
          (col("maxham") <= 2).as("pairs_within_radius"),
          (col("n_pairs") >= col("n_docs")).as("nonvacuous"))
    }),

    // --- Mergeable sketch states across persisted snapshots -----------------
    // The telemetry-rollup posture: two disjoint "snapshots" each persist
    // a per-key HLL state table once; corpus cardinalities then come from
    // UNIONING the state files and merging — the raw snapshots are never
    // rescanned. Counts must sum exactly; the merged estimate must land
    // within the 5% HLL contract of the exact distinct count per key.
    "a26_sketch_merge" -> ((s, d) => {
      val base = memoizedLayout(s, s"$d#hllstates") { () =>
        val p = s"/tmp/graft_hll_${sfTag(d).replace(".", "_")}"
        val ev = graft.core.Tables.events(s, d)
        graft.ops.Profile.hllStates(
          ev.filter(col("event_id") % 2 === 0), "event_type", "user_id")
          .write.mode("overwrite").parquet(s"$p/s0")
        graft.ops.Profile.hllStates(
          ev.filter(col("event_id") % 2 === 1), "event_type", "user_id")
          .write.mode("overwrite").parquet(s"$p/s1")
        p
      }
      val states = s.read.parquet(s"$base/s0")
        .unionByName(s.read.parquet(s"$base/s1"))
      val merged = graft.ops.Profile.mergeHllStates(states, "event_type")
      val exact = graft.core.Tables.events(s, d).groupBy("event_type")
        .agg(countDistinct("user_id").as("d_exact"),
          count(lit(1)).as("n_exact"))
      merged.join(exact, "event_type")
        .agg(
          min(col("n") === col("n_exact")).as("merge_counts_exact"),
          min(abs(col("n_distinct_approx") - col("d_exact")) <=
            col("d_exact") * lit(0.05) + lit(1.0))
            .as("merge_estimate_within_5pct"))
    }),

    // --- Streaming left-outer interval join ---------------------------------
    // The outer twin of w_stream_join: clicks keep a null-padded row when
    // no error precedes them within 24 h. Outer emission is watermark-
    // driven, so a far-future sentinel on BOTH feeds pushes the watermark
    // past every real row before the sink is read; sentinels filter out.
    "w_stream_join_outer" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        val tag = sfTag(d).replace(".", "_")
        def feed(kind: String) = Round6Queries.eventsFeed(ss, d)
          .filter(_._4 == kind).map(r => (r._1, r._2, r._3))
        val memL = MemoryStream[(Long, java.sql.Timestamp, Long)]
        val memR = MemoryStream[(Long, java.sql.Timestamp, Long)]
        val out = graft.streaming.EventStreams.intervalJoin(
          memL.toDS().toDF("event_id", "ts", "user_id"),
          memR.toDS().toDF("event_id", "ts", "user_id"),
          lookbackMinutes = 24 * 60, joinType = "left_outer")
        val sink = s"w_stream_join_outer_$tag"
        ss.catalog.dropTempView(sink)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          val clicks = feed("click"); val errors = feed("error")
          val maxTs = (clicks ++ errors).map(_._2.getTime).max
          val sentinel = (-1L,
            new java.sql.Timestamp(maxTs + 30L * 86400000L), -1L)
          memL.addData(clicks: _*); memR.addData(errors: _*)
          q.processAllAvailable()
          memL.addData(sentinel); memR.addData(sentinel)
          q.processAllAvailable()
        } finally q.stop()
        ss.table(sink)
          .filter(col("user_id") =!= -1L)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("r_event_id"),
            unix_micros(col("r_ts")).as("r_ts_us"))
      }))

  private def sfTag(d: String): String = new java.io.File(d).getName

  /** Layout gates write once per (SparkContext, key) and re-read on every
    * invocation — re-writing per bench run would measure the sink, not
    * the read-side layout contract. */
  private val layoutMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def memoizedLayout(s: SparkSession, key: String)
                            (build: () => String): String = {
    val perKey = layoutMemo.synchronized {
      var m = layoutMemo.get(s.sparkContext)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, String]()
        layoutMemo.put(s.sparkContext, m)
      }
      m
    }
    perKey.computeIfAbsent(key, _ => build())
  }

  /** Shared walk-corpus CTE chain (steps unrolled, argmin per step) —
    * both the walks gate and the skip-gram gate read the same corpus. */
  private def walksCte(steps: Int): String = {
    val stepCtes = (1 to steps).map { i =>
      s""", s$i AS MATERIALIZED (
         |  SELECT walk_id, v AS cur FROM (
         |    SELECT w.walk_id, adj.v,
         |      row_number() OVER (PARTITION BY w.walk_id
         |        ORDER BY md5(CAST(w.walk_id AS VARCHAR) || ':$i:' ||
         |          CAST(adj.v AS VARCHAR)), adj.v) AS rn
         |    FROM s${i - 1} w JOIN adj ON w.cur = adj.u)
         |  WHERE rn = 1
         |)""".stripMargin
    }.mkString("\n")
    val unions = (1 to steps).map(i =>
      s"  UNION ALL SELECT walk_id, $i, cur FROM s$i").mkString("\n")
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e0 AS MATERIALIZED (
       |  SELECT a.pk AS a, b.pk AS b
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |), adj AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0
       |), s0 AS MATERIALIZED (
       |  SELECT DISTINCT u AS walk_id, u AS cur FROM adj
       |)
       |$stepCtes
       |, wr AS MATERIALIZED (
       |  SELECT CAST(walk_id AS BIGINT) AS walk_id, 0 AS pos,
       |    CAST(walk_id AS BIGINT) AS node FROM s0
       |$unions
       |)""".stripMargin
  }

  private def walksOracle(steps: Int): String =
    s"""${walksCte(steps)}
       |SELECT walk_id, pos, node FROM wr
       |""".stripMargin

  private def bfsOracle(levels: Int): String = {
    val steps = (1 to levels).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, min(hops) AS hops FROM (
         |    SELECT node, hops FROM d${i - 1}
         |    UNION ALL
         |    SELECT adj.v, d${i - 1}.hops + 1
         |    FROM d${i - 1} JOIN adj ON d${i - 1}.node = adj.u)
         |  GROUP BY node
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
       |  SELECT p_partkey AS node, 0 AS hops FROM part
       |  WHERE p_partkey % 50 = 0
       |),
       |$steps
       |SELECT CAST(node AS BIGINT) AS node, CAST(hops AS INTEGER) AS hops
       |FROM d$levels
       |""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "a21_bfs_hops" -> bfsOracle(12),

    "a22_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
        |)
        |SELECT 1 AS stage, 'view' AS stage_name,
        |  (SELECT count(*) FROM s1) AS users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        |""".stripMargin,

    "a27_conversion_lag" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
        |)
        |SELECT 'view->click' AS transition, count(*) AS n,
        |  CAST(sum(epoch_us(t2) - epoch_us(t1)) AS BIGINT) AS sum_lag_us,
        |  min(epoch_us(t2) - epoch_us(t1)) AS min_lag_us,
        |  max(epoch_us(t2) - epoch_us(t1)) AS max_lag_us
        |FROM s2 JOIN s1 USING (user_id)
        |UNION ALL
        |SELECT 'click->purchase', count(*),
        |  CAST(sum(epoch_us(t3) - epoch_us(t2)) AS BIGINT),
        |  min(epoch_us(t3) - epoch_us(t2)),
        |  max(epoch_us(t3) - epoch_us(t2))
        |FROM s3 JOIN s2 USING (user_id)
        |""".stripMargin,

    "j10_asof_strict" ->
      """WITH l AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, epoch_us(ts) AS rts, max(value) AS err_value
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
        |)
        |SELECT l.user_id, l.ts_us, l.event_id, r.rts AS r_rts,
        |  r.err_value AS r_err_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us > r.rts
        |""".stripMargin,

    "j14_asof_nearest" ->
      """WITH l AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, epoch_us(ts) AS rts, max(value) AS err_value
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
        |), b AS (
        |  SELECT l.event_id, r.rts, r.err_value
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts_us >= r.rts
        |), f AS (
        |  SELECT l.event_id, r.rts, r.err_value
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts_us <= r.rts
        |)
        |SELECT l.user_id, l.ts_us, l.event_id,
        |  CASE WHEN bok AND (NOT fok OR l.ts_us - b.rts <= f.rts - l.ts_us)
        |       THEN b.rts WHEN fok THEN f.rts END AS r_rts,
        |  CASE WHEN bok AND (NOT fok OR l.ts_us - b.rts <= f.rts - l.ts_us)
        |       THEN b.err_value WHEN fok THEN f.err_value
        |    END AS r_err_value
        |FROM l
        |JOIN b ON b.event_id = l.event_id
        |JOIN f ON f.event_id = l.event_id
        |CROSS JOIN LATERAL (SELECT
        |  b.rts IS NOT NULL AND b.rts >= l.ts_us - 600000000 AS bok,
        |  f.rts IS NOT NULL AND f.rts <= l.ts_us + 600000000 AS fok) g
        |""".stripMargin,

    "j15_scd2_enrich" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, min(event_type) AS state
        |  FROM events GROUP BY 1, 2
        |), x AS (
        |  SELECT user_id, ts_us, state,
        |    lag(state) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), c AS (
        |  SELECT user_id, ts_us, state FROM x
        |  WHERE rn = 1 OR state IS DISTINCT FROM prev
        |), iv AS (
        |  SELECT user_id, state, ts_us AS valid_from,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
        |      AS valid_to
        |  FROM c
        |), p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'purchase'
        |)
        |SELECT p.user_id, p.event_id, p.ts_us,
        |  iv.valid_from AS r_valid_from, iv.state AS r_state
        |FROM p LEFT JOIN iv ON p.user_id = iv.user_id
        |  AND iv.valid_from <= p.ts_us
        |  AND (iv.valid_to IS NULL OR p.ts_us < iv.valid_to)
        |""".stripMargin,

    "w_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, min(event_type) AS state
        |  FROM events GROUP BY 1, 2
        |), x AS (
        |  SELECT user_id, ts_us, state,
        |    lag(state) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        |), c AS (
        |  SELECT user_id, ts_us, state FROM x
        |  WHERE rn = 1 OR state IS DISTINCT FROM prev
        |)
        |SELECT user_id, state, ts_us AS valid_from,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
        |    AS valid_to
        |FROM c
        |""".stripMargin,

    "u2_except_intersect" ->
      """SELECT user_id, 'click_only' AS set_label FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT user_id, 'both' FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |""".stripMargin,

    "o10_ntile" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), r AS (
        |  SELECT event_type, cents,
        |    ntile(10) OVER w AS bin,
        |    percent_rank() OVER w AS pr
        |  FROM e WINDOW w AS (PARTITION BY event_type
        |    ORDER BY cents, event_id)
        |)
        |SELECT event_type, bin, count(*) AS n, min(cents) AS lo,
        |  max(cents) AS hi, max(pr) AS top_pr
        |FROM r GROUP BY 1, 2
        |""".stripMargin,

    "w_rolling_sum" ->
      """SELECT user_id, epoch_us(ts) AS ts_us,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  CAST(count(*) OVER w AS BIGINT) AS roll_n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
        |    AS roll_sum
        |FROM events WHERE event_type = 'click'
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |""".stripMargin,

    "a23_retention" ->
      """WITH a AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS p
        |  FROM events GROUP BY 1, 2
        |), c AS (
        |  SELECT user_id, min(p) AS cohort FROM a GROUP BY 1
        |)
        |SELECT c.cohort, (a.p - c.cohort) // 7 AS period_no,
        |  count(*) AS active_users
        |FROM a JOIN c USING (user_id) GROUP BY 1, 2
        |""".stripMargin,

    "a24_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |""".stripMargin,

    "a25_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS view
        |FROM events GROUP BY 1
        |""".stripMargin,

    "k15_partitioned_layout" ->
      """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT)
        |  AS chars
        |FROM documents WHERE lang = 'en' GROUP BY 1
        |""".stripMargin,

    "k16_compacted" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    "k18_zorder_layout" -> {
      val terms = (0 until 8).map { i =>
        s"(((((doc_id & 255) >> $i) & 1) << ${2 * i}) | " +
          s"((((n_chars & 255) >> $i) & 1) << ${2 * i + 1}))"
      }.mkString(" | ")
      "SELECT doc_id, text, lang, source, n_chars, " +
        s"CAST($terms AS BIGINT) AS z FROM documents"
    },

    "k17_jsonl_export" ->
      "SELECT doc_id, lang, text FROM documents",

    "a26_sketch_merge" ->
      ("SELECT true AS merge_counts_exact, " +
        "true AS merge_estimate_within_5pct"),

    "mm_dhash_pairs" ->
      ("SELECT true AS planted_all_recovered, " +
        "true AS pairs_within_radius, true AS nonvacuous"),

    "t_drift_report" ->
      (s"""WITH ca AS (
        |  SELECT g, w, count(*) AS ca FROM (
        |    SELECT lang AS g, unnest(string_split(
        |      ${Queries.normSql}, ' ')) AS w
        |    FROM documents WHERE doc_id % 2 = 0)
        |  GROUP BY 1, 2
        |), cb AS (
        |  SELECT g, w, count(*) AS cb FROM (
        |    SELECT lang AS g, unnest(string_split(
        |      ${Queries.normSql}, ' ')) AS w
        |    FROM documents WHERE doc_id % 2 = 1)
        |  GROUP BY 1, 2
        |), j AS (
        |  SELECT coalesce(ca.g, cb.g) AS g,
        |    coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL JOIN cb ON ca.g = cb.g AND ca.w = cb.w
        |)
        |SELECT g AS lang,
        |  CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS vocab_a,
        |  CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS vocab_b,
        |  CAST(sum(CASE WHEN ca = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS new_words,
        |  CAST(sum(CASE WHEN cb = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS vanished_words,
        |  CAST(sum(ca) AS BIGINT) AS tokens_a,
        |  CAST(sum(cb) AS BIGINT) AS tokens_b,
        |  CAST(sum(abs(ca - cb)) AS BIGINT) AS l1
        |FROM j GROUP BY 1
        |""").stripMargin,

    "g10_random_walks" -> walksOracle(4),

    "g12_skipgram_pairs" ->
      s"""${walksCte(4)}
         |SELECT a.node AS center, b.node AS context, count(*) AS n
         |FROM wr a JOIN wr b
         |  ON a.walk_id = b.walk_id AND a.pos <> b.pos
         |  AND abs(a.pos - b.pos) <= 2
         |GROUP BY 1, 2
         |""".stripMargin,

    "g11_negative_samples" ->
      """WITH nb AS (
        |  SELECT greatest(16, count(DISTINCT p_partkey) // 32) AS b
        |  FROM part
        |), tr AS (
        |  SELECT DISTINCT l_orderkey AS s, 'contains' AS r,
        |    l_partkey AS o
        |  FROM lineitem WHERE l_orderkey % 20 = 0
        |), ent AS (
        |  SELECT DISTINCT p_partkey AS e,
        |    ('0x' || substring(md5(CAST(p_partkey AS VARCHAR) ||
        |      ':negbucket'), 1, 8))::BIGINT % (SELECT b FROM nb) AS b
        |  FROM part
        |), slots AS (
        |  SELECT s, r, o, slot,
        |    ('0x' || substring(md5(CAST(s AS VARCHAR) || ':' || r ||
        |      ':' || CAST(o AS VARCHAR) || ':' ||
        |      CAST(slot AS VARCHAR) || ':negslot'), 1, 8))::BIGINT
        |      % (SELECT b FROM nb) AS b
        |  FROM tr, (SELECT unnest([0, 1]) AS slot)
        |), drawn AS (
        |  SELECT s, r, o, slot, e,
        |    row_number() OVER (PARTITION BY s, r, o, slot
        |      ORDER BY md5(CAST(s AS VARCHAR) || ':' || r || ':' ||
        |        CAST(o AS VARCHAR) || ':' || CAST(slot AS VARCHAR) ||
        |        ':' || CAST(e AS VARCHAR)), e) AS rn
        |  FROM slots JOIN ent USING (b)
        |), neg AS (
        |  SELECT s, r, o, slot, e AS neg_o FROM drawn WHERE rn = 1
        |)
        |SELECT n.s, n.r, n.o, n.slot, n.neg_o FROM neg n
        |ANTI JOIN tr t ON t.s = n.s AND t.r = n.r AND t.o = n.neg_o
        |""".stripMargin,

    "w_stream_join_outer" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id AS r_user_id, event_id AS r_event_id,
        |    epoch_us(ts) AS r_ts_us
        |  FROM events WHERE event_type = 'error'
        |)
        |SELECT l.user_id, l.event_id, l.ts_us, r.r_event_id, r.r_ts_us
        |FROM l LEFT JOIN r ON l.user_id = r.r_user_id
        |  AND r.r_ts_us BETWEEN l.ts_us - 86400000000 AND l.ts_us
        |""".stripMargin,

    "d_cosine_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
        |  FROM documents
        |), u AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(ws) - 2),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM t
        |), tf AS (
        |  SELECT g, doc_id, count(*) AS tf FROM u GROUP BY 1, 2
        |), keep AS (
        |  SELECT g FROM tf GROUP BY g HAVING count(*) <= 50
        |), k AS (
        |  SELECT tf.* FROM tf SEMI JOIN keep USING (g)
        |), norms AS (
        |  SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2
        |  FROM k GROUP BY 1
        |), dots AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        |  FROM k a JOIN k b USING (g)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        |)
        |SELECT d1, d2, dot, na.n2 AS n1sq, nb.n2 AS n2sq
        |FROM dots
        |JOIN norms na ON na.doc_id = d1
        |JOIN norms nb ON nb.doc_id = d2
        |WHERE 4 * dot * dot >= na.n2 * nb.n2
        |""".stripMargin)
}
