package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-9 registrations — the production faces the round-8 verdict
  * ranked next:
  *
  *  - `w_stream_asof`: streaming as-of enrichment
  *    ([[graft.streaming.AsOfStream]]) — the event stream picks up the
  *    latest same-user state row at or before each event, continuously,
  *    vs DuckDB's native backward-inclusive ASOF LEFT JOIN over the
  *    same feed.
  *  - `j16_resample_ffill`: time-series resample + forward-fill
  *    ([[graft.ops.Temporal.resampleFfill]]) vs DuckDB generate_series
  *    + native ASOF.
  *  - `a28_incremental_cc`: incremental connected components
  *    ([[graft.bel.IncrementalCC]]) — a delta batch folded into the
  *    persisted label index must equal the from-scratch run over the
  *    union graph, pinned against an independent full-graph recursive
  *    CTE.
  *  - `s_ivf_bench_recall`: recall@10 of the persisted IVF index over
  *    the raw embeddings corpus at a stated probe budget, truth from
  *    the exact brute-force scan — catches centroid-count/probe-budget
  *    rot the planted-twin invariant gates cannot see.
  *  - `w_twap`: time-weighted average buckets
  *    ([[graft.ops.Temporal.twapBuckets]]) — exact integer cents×µs
  *    mass per hour bucket, vs the lead-segment + generate_series SQL.
  *  - `j17_asof_broadcast`: the dimension-sized-right as-of
  *    specialization ([[graft.ops.Temporal.asOfJoinBroadcast]]) — the
  *    event side never shuffles; j10's oracle reused verbatim.
  *  - `a29_expectations`: single-pass data-quality expectation report
  *    ([[graft.ops.Expectations]]) — completeness/uniqueness/bounds/
  *    domain/row-count in ONE aggregation plus the referential probe,
  *    pass AND fail paths oracle-pinned with exact fractions.
  *  - `w_stream_expect`: continuous data-quality monitoring
  *    ([[graft.streaming.ExpectStream]]) — the a29 suite per
  *    micro-batch, replay-idempotent partitioned reports, each batch's
  *    rows value-exact vs the same-slice SQL.
  *  - `k19_cdc_apply` / `w_stream_cdc`: CDC snapshot fold
  *    ([[graft.ops.Cdc]], [[graft.streaming.CdcStream]]) —
  *    last-writer-wins upsert + delete tombstones in one struct-max
  *    aggregation, batch and versioned-snapshot streaming faces sharing
  *    one oracle (folds compose).
  */
object Round9Queries {
  private type Q = (SparkSession, String) => DataFrame

  private def sfTag(d: String): String =
    new java.io.File(d).getName.replace(".", "_")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  // weak session keys — the Round6Queries ivfadcMemo posture
  private val ivfBenchMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Unit]]())

  private def rmrf(s: SparkSession, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
  }

  /** The shared k19/w_stream_cdc changelog: every order becomes one
    * change row (seq = o_orderkey + 1: orderkey 0 exists in the corpus
    * and sequences must be positive); BOTH gates must keep this
    * identical because they share one oracle. */
  private def cdcBase(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  private def cdcChanges(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      when(col("o_orderkey") % 7 === 3, col("o_custkey") + 1000000)
        .otherwise(col("o_custkey")).as("c_custkey"),
      concat(lit("n"), col("o_orderkey")).as("c_name"),
      col("o_totalprice").as("c_acctbal"),
      when(col("o_orderkey") % 7 === 0, "D")
        .when(col("o_orderkey") % 7 === 3, "I")
        .otherwise("U").as("op"),
      (col("o_orderkey") + 1).cast("long").as("seq"))

  private val HourUs = 3600000000L

  val queries: Map[String, Q] = Map[String, Q](

    // --- Time-series resample + forward-fill --------------------------------
    // Each user's event stream projected onto the hourly grid, every
    // grid instant carrying the latest observation at or before it —
    // the feature-store "state as of every hour" export. Observations
    // pre-aggregated per (user, µs) (max event_id / max value) so the
    // fill winner is engine-independent; oracle = DuckDB
    // generate_series grid + native backward-inclusive ASOF.
    "j16_resample_ffill" -> ((s, d) => {
      val obs = graft.core.Tables.events(s, d)
        .groupBy(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .agg(max("event_id").as("event_id"), max("value").as("value"))
      graft.ops.Temporal.resampleFfill(obs, Seq("user_id"), "ts_us",
        stepUs = HourUs)
    }),

    // --- Time-weighted average (TWAP) buckets -------------------------------
    // Per user, the time-weighted mass of the piecewise-constant click
    // value per hour bucket — exact integers only (cents × µs), the
    // rollingSum quantization contract, so the gate is value-exact.
    // Same-µs conflicts pre-aggregated to max cents (j10 discipline).
    "w_twap" -> ((s, d) => {
      val obs = graft.core.Tables.events(s, d)
        .filter(col("event_type") === "click")
        .groupBy(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .agg(max(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.ops.Temporal.twapBuckets(obs, Seq("user_id"), "ts_us",
        "cents", stepUs = HourUs)
    }),

    // --- CDC apply: upsert + delete tombstones ------------------------------
    // The lakehouse MERGE semantics over the customer snapshot: every
    // order becomes a change row (key o_custkey; op by o_orderkey % 7 —
    // 0 delete, 3 insert-under-new-key, else update; seq = o_orderkey+1,
    // globally unique and positive so last-writer-wins is engine-
    // independent). One shuffle, struct-max winner (plan-pinned);
    // oracle = the row_number formulation DuckDB-side.
    "k19_cdc_apply" -> ((s, d) =>
      graft.ops.Cdc.applySnapshot(cdcBase(s, d), cdcChanges(s, d),
        Seq("c_custkey"))),

    // --- Streaming CDC maintenance ------------------------------------------
    // The k19 changelog delivered as TWO seq-ordered micro-batches
    // through CdcStream's versioned-snapshot foreachBatch fold; the
    // final snapshot must equal the one-shot batch apply (folds
    // compose), so the k19 oracle is reused verbatim.
    "w_stream_cdc" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        val tag = sfTag(d)
        val base = cdcBase(ss, d)
        val changes = cdcChanges(ss, d)
          .as[(Long, String, Double, String, Long)]
          .collect().sortBy(_._5)
        val path = s"/tmp/graft_cdcstream_$tag"
        rmrf(ss, path); rmrf(ss, s"$path-ckpt")
        val mem = MemoryStream[(Long, String, Double, String, Long)]
        val q = graft.streaming.CdcStream.run(
          mem.toDS().toDF("c_custkey", "c_name", "c_acctbal", "op", "seq"),
          path, base, Seq("c_custkey"), s"$path-ckpt")
        try {
          val (h1, h2) = changes.splitAt(changes.length / 2)
          mem.addData(h1: _*); q.processAllAvailable()
          mem.addData(h2: _*); q.processAllAvailable()
        } finally q.stop()
        graft.streaming.CdcStream.currentView(ss, path).get
      }),

    // --- Data-quality expectation suite -------------------------------------
    // The ingest-time validation report over events: completeness,
    // uniqueness, bounds, domain membership, row count — ONE aggregation
    // pass — plus the referential-integrity probe against customer.
    // Failing checks are part of the gate (the narrowed domain and the
    // tight bounds yield passed=false rows), so the fail path is
    // oracle-pinned too, with exact fractions on both sides.
    "a29_expectations" -> ((s, d) => {
      import graft.ops.Expectations
      val ev = graft.core.Tables.events(s, d)
      Expectations.run(ev, Seq(
          Expectations.notNull("event_id"),
          Expectations.notNull("user_id"),
          Expectations.unique("event_id"),
          Expectations.bounds("value", 0.0, 500.0),
          Expectations.bounds("value", 0.0, 100.0),
          Expectations.valuesIn("event_type",
            Seq("view", "click", "purchase", "error")),
          Expectations.rowCountBetween(1L, 100000000L)))
        .unionByName(Expectations.foreignKey(ev, "user_id",
          t(s, d, "customer"), "c_custkey"))
    }),

    // --- Streaming expectation monitoring -----------------------------------
    // The a29 suite run per micro-batch: events delivered as two
    // parity-split batches (even event_ids then odd — a split the
    // oracle can reproduce), each scored by the same single-pass suite,
    // reports appended with the batch id. Value-exact per batch: the
    // narrowed domain check fails in BOTH batches with each half's own
    // exact fraction.
    "w_stream_expect" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import graft.ops.Expectations
        val tag = sfTag(d)
        val feed = Round6Queries.eventsFeed(ss, d)
          .map(e => (e._1, e._3, e._4, e._5)) // (event_id, user_id, type, value)
        val path = s"/tmp/graft_expectstream_$tag"
        rmrf(ss, path); rmrf(ss, s"$path-ckpt")
        val mem = MemoryStream[(Long, Long, String, Double)]
        val checks = Seq(
          Expectations.notNull("user_id"),
          Expectations.bounds("value", 0.0, 500.0),
          Expectations.valuesIn("event_type",
            Seq("view", "click", "purchase", "error")),
          Expectations.rowCountBetween(1L, 100000000L))
        val q = graft.streaming.ExpectStream.run(
          mem.toDS().toDF("event_id", "user_id", "event_type", "value"),
          checks, path, s"$path-ckpt")
        try {
          mem.addData(feed.filter(_._1 % 2 == 0): _*)
          q.processAllAvailable()
          mem.addData(feed.filter(_._1 % 2 == 1): _*)
          q.processAllAvailable()
        } finally q.stop()
        // batch_id rides back as the (int-inferred) partition column
        ss.read.parquet(path)
          .withColumn("batch_id", col("batch_id").cast("long"))
      }),

    // --- Broadcast as-of join -----------------------------------------------
    // The SAME query as j10_asof_join (latest same-user error within the
    // trailing hour of each click) through the dimension-sized-right
    // specialization: the click side never shuffles — states compact to
    // one sorted array per user, broadcast, and each click resolves
    // in-row. Oracle reused verbatim from j10 (identical semantics is
    // the whole point); the never-shuffles claim is plan-pinned.
    "j17_asof_broadcast" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
      val tsUs = unix_micros(col("ts").cast("timestamp"))
      val l = ev.filter(col("event_type") === "click")
        .select(col("user_id"), tsUs.as("ts_us"), col("event_id"),
          col("value"))
      val r = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), tsUs.as("rts"))
        .agg(max("value").as("err_value"))
      graft.ops.Temporal.asOfJoinBroadcast(l, r, Seq("user_id"),
        leftTs = "ts_us", rightTs = "rts",
        tolerance = Some(3600000000L))
    }),

    // --- Bench-scale IVF recall@10 -------------------------------------------
    // The persisted IVF index queried over the RAW embeddings corpus (no
    // planted twins): recall@10 >= 0.9 for 32 queries at the STATED
    // budget nList = 16 / nProbe = 12 / 3 refine iterations, truth from
    // the exact brute-force scan. The corpus is near-uniform (intra-
    // label fraction of true top-10 neighbors is ~0.11, measured), so
    // this budget is what honest 0.9 recall costs on it — the gate
    // exists to catch centroid-count/probe-budget rot that the planted-
    // twin invariant gates cannot see (measured margin: recall 0.93 at
    // both sf0.01 and sf0.1).
    "s_ivf_bench_recall" -> ((s, d) => {
      val corpus = t(s, d, "embeddings").select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("embedding"))
      val path = s"/tmp/graft_ivfbench_${sfTag(d)}"
      ivfBenchMemo
        .computeIfAbsent(s,
          _ => new java.util.concurrent.ConcurrentHashMap())
        .computeIfAbsent(d, { _ =>
          rmrf(s, path)
          graft.ops.IvfIndex.build(corpus, path, nList = 16,
            refineIterations = 3)
          ()
        })
      val qs = corpus.filter(col("vec_id") < 32)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val truth = graft.ops.Similarity.bruteForceTopK(corpus, qs, k = 10)
        .select("query_id", "id")
      val got = graft.ops.IvfIndex.topK(s, path, qs, k = 10, nProbe = 12)
        .select("query_id", "id")
      val hits = truth.join(got, Seq("query_id", "id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      val total = truth.agg(count(lit(1)).as("n_true"))
      hits.crossJoin(total).select(
        (col("n_hit").cast("double") / col("n_true") >= 0.9)
          .as("recall_ok"),
        (col("n_true") === 320).as("truth_complete"))
    }),

    // --- Incremental connected components -----------------------------------
    // The persisted-label-index fold: the base graph (supplier→nation
    // stars, 25 components) absorbs a delta batch (nation→region edges)
    // that MERGES them into the 5 region components — the fold re-runs
    // the star loop only over the delta-touched super-graph, never the
    // base edges. Labels canonicalized to the min node string per
    // component (the a13 discipline); the oracle computes components of
    // the FULL union graph independently, so a green row proves
    // fold(index, delta) == from-scratch(base ∪ delta) value-exactly.
    // (An a17-style AQE-off scoping was MEASURED WORSE here -- 4.9 s vs
    // 3.2 s -- the star loop's many tiny convergence-check aggregations
    // benefit from AQE's runtime partition coalescing more than they pay
    // in re-planning jobs; so this gate keeps the session defaults.)
    "a28_incremental_cc" -> ((s, d) => {
      val base = t(s, d, "supplier").select(
        concat(lit("s:"), col("s_suppkey")).as("src"),
        concat(lit("n:"), col("s_nationkey")).as("dst"))
      val delta = t(s, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      val folded = graft.bel.IncrementalCC.fold(
        graft.bel.ConnectedComponents.run(base), delta)
      val canon = folded.groupBy("component").agg(min("node").as("comp"))
      folded.join(canon, "component").select("node", "comp")
    }),

    // --- Streaming as-of enrichment -----------------------------------------
    // Clicks enriched with the latest same-user error state at or before
    // each click — the streaming face of the complete j10 batch as-of
    // matrix. Two MemoryStreams feed the tagged union in two
    // time-ordered batches plus the watermark-advancing sentinel (the
    // w_stream_join_outer flush discipline); every click must emit
    // EXACTLY once with its final backward match. Error feed
    // pre-aggregated per (user, µs) to max event_id — the j10 tie
    // discipline, making the winner engine-independent. Oracle: DuckDB
    // native ASOF LEFT JOIN on the same µs longs.
    "w_stream_asof" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        val tag = sfTag(d)
        def feed(kind: String) = Round6Queries.eventsFeed(ss, d)
          .filter(_._4 == kind).map(r => (r._1, r._2, r._3))
        val memL = MemoryStream[(Long, java.sql.Timestamp, Long)]
        val memR = MemoryStream[(Long, java.sql.Timestamp, Long)]
        val out = graft.streaming.AsOfStream.asOfEnrich(
          memL.toDS().toDF("event_id", "ts", "user_id"),
          memR.toDS().toDF("event_id", "ts", "user_id"))
        val sink = s"w_stream_asof_$tag"
        ss.catalog.dropTempView(sink)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          val clicks = feed("click")
          // (user, µs)-unique error feed: ties resolve to max event_id
          // before the stream ever sees them
          val errors = feed("error")
            .groupBy(e => (e._3, e._2.getTime, e._2.getNanos))
            .values.map(_.maxBy(_._1)).toSeq
          val maxTs = (clicks ++ errors).map(_._2.getTime).max
          val cut = (clicks ++ errors).map(_._2.getTime).min +
            (maxTs - (clicks ++ errors).map(_._2.getTime).min) / 2
          // two batches split at a COMMON time boundary so nothing is
          // ever below the post-batch watermark (no late drops), then
          // the sentinel forces every pending match final
          memL.addData(clicks.filter(_._2.getTime < cut): _*)
          memR.addData(errors.filter(_._2.getTime < cut): _*)
          q.processAllAvailable()
          memL.addData(clicks.filter(_._2.getTime >= cut): _*)
          memR.addData(errors.filter(_._2.getTime >= cut): _*)
          q.processAllAvailable()
          val sentinel = (-1L,
            new java.sql.Timestamp(maxTs + 30L * 86400000L), -1L)
          memL.addData(sentinel); memR.addData(sentinel)
          q.processAllAvailable()
        } finally q.stop()
        ss.table(sink)
          .filter(col("user_id") =!= -1L)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("r_event_id"),
            unix_micros(col("r_ts")).as("r_ts_us"))
      }))

  val oracleSql: Map[String, String] = Map(

    "s_ivf_bench_recall" ->
      "SELECT true AS recall_ok, true AS truth_complete",

    "j17_asof_broadcast" -> Round7Queries.oracleSql("j10_asof_join"),

    "w_stream_expect" ->
      (s"""WITH h0 AS (SELECT * FROM events WHERE event_id % 2 = 0),
        |h1 AS (SELECT * FROM events WHERE event_id % 2 = 1)
        |${expectHalfSql("h0", 0)}
        |UNION ALL
        |${expectHalfSql("h1", 1)}
        |""").stripMargin,

    "w_stream_cdc" -> cdcOracle,

    "k19_cdc_apply" -> cdcOracle,

    "a29_expectations" ->
      """SELECT 'not_null(event_id)' AS "check",
        |  CAST(count(event_id) AS DOUBLE) / count(*) AS metric,
        |  count(event_id) = count(*) AS passed FROM events
        |UNION ALL
        |SELECT 'not_null(user_id)',
        |  CAST(count(user_id) AS DOUBLE) / count(*),
        |  count(user_id) = count(*) FROM events
        |UNION ALL
        |SELECT 'unique(event_id)',
        |  CAST(count(DISTINCT event_id) AS DOUBLE) / count(event_id),
        |  count(DISTINCT event_id) = count(event_id) FROM events
        |UNION ALL
        |SELECT 'bounds(value,0.0,500.0)',
        |  CAST(count(*) FILTER (value BETWEEN 0 AND 500) AS DOUBLE)
        |    / count(value),
        |  count(*) FILTER (value BETWEEN 0 AND 500) = count(value)
        |FROM events
        |UNION ALL
        |SELECT 'bounds(value,0.0,100.0)',
        |  CAST(count(*) FILTER (value BETWEEN 0 AND 100) AS DOUBLE)
        |    / count(value),
        |  count(*) FILTER (value BETWEEN 0 AND 100) = count(value)
        |FROM events
        |UNION ALL
        |SELECT 'values_in(event_type)',
        |  CAST(count(*) FILTER (event_type IN
        |    ('view', 'click', 'purchase', 'error')) AS DOUBLE)
        |    / count(event_type),
        |  count(*) FILTER (event_type IN
        |    ('view', 'click', 'purchase', 'error')) = count(event_type)
        |FROM events
        |UNION ALL
        |SELECT 'row_count(1,100000000)', CAST(count(*) AS DOUBLE),
        |  count(*) BETWEEN 1 AND 100000000 FROM events
        |UNION ALL
        |SELECT 'foreign_key(user_id->c_custkey)',
        |  CAST((SELECT count(*) FROM events e
        |    LEFT JOIN customer c ON e.user_id = c.c_custkey
        |    WHERE e.user_id IS NOT NULL AND c.c_custkey IS NULL)
        |    AS DOUBLE),
        |  (SELECT count(*) FROM events e
        |    LEFT JOIN customer c ON e.user_id = c.c_custkey
        |    WHERE e.user_id IS NOT NULL AND c.c_custkey IS NULL) = 0
        |""".stripMargin,

    "w_twap" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    max(CAST(round(value * 100) AS BIGINT)) AS cents
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |), seg AS (
        |  SELECT user_id, ts_us, cents,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS nxt
        |  FROM o
        |), sp AS (
        |  SELECT user_id, ts_us, cents, nxt,
        |    unnest(generate_series(ts_us // 3600000000,
        |      (nxt - 1) // 3600000000)) AS b
        |  FROM seg WHERE nxt IS NOT NULL AND nxt > ts_us
        |)
        |SELECT user_id, b * 3600000000 AS bucket_ts,
        |  CAST(sum(cents * (least(nxt, (b + 1) * 3600000000)
        |    - greatest(ts_us, b * 3600000000))) AS BIGINT) AS weighted_us,
        |  CAST(sum(least(nxt, (b + 1) * 3600000000)
        |    - greatest(ts_us, b * 3600000000)) AS BIGINT) AS covered_us
        |FROM sp GROUP BY 1, 2
        |""".stripMargin,

    "a28_incremental_cc" ->
      """WITH edges AS (
        |  SELECT 's:' || s_suppkey AS src, 'n:' || s_nationkey AS dst
        |  FROM supplier
        |  UNION ALL
        |  SELECT 'n:' || n_nationkey AS src, 'r:' || n_regionkey AS dst
        |  FROM nation
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

    "j16_resample_ffill" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |    max(event_id) AS event_id, max(value) AS value
        |  FROM events GROUP BY 1, 2
        |), b AS (
        |  SELECT user_id,
        |    ((min(ts_us) + 3599999999) // 3600000000) * 3600000000 AS g0,
        |    max(ts_us) AS mx
        |  FROM o GROUP BY 1
        |), g AS (
        |  SELECT user_id, unnest(generate_series(g0, mx, 3600000000))
        |    AS grid_ts
        |  FROM b WHERE g0 <= mx
        |)
        |SELECT g.user_id, g.grid_ts, o.ts_us AS r_ts_us,
        |  o.event_id AS r_event_id, o.value AS r_value
        |FROM g ASOF LEFT JOIN o
        |  ON g.user_id = o.user_id AND g.grid_ts >= o.ts_us
        |""".stripMargin,

    "w_stream_asof" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, epoch_us(ts) AS r_ts_us,
        |    max(event_id) AS r_event_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
        |)
        |SELECT l.user_id, l.event_id, l.ts_us, r.r_event_id, r.r_ts_us
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.r_ts_us
        |""".stripMargin)

  /** One micro-batch half of the w_stream_expect oracle — must mirror
    * the gate's check list exactly. */
  private def expectHalfSql(half: String, batchId: Int): String =
    s"""SELECT CAST($batchId AS BIGINT) AS batch_id,
       |  'not_null(user_id)' AS "check",
       |  CAST(count(user_id) AS DOUBLE) / count(*) AS metric,
       |  count(user_id) = count(*) AS passed FROM $half
       |UNION ALL
       |SELECT $batchId, 'bounds(value,0.0,500.0)',
       |  CAST(count(*) FILTER (value BETWEEN 0 AND 500) AS DOUBLE)
       |    / count(value),
       |  count(*) FILTER (value BETWEEN 0 AND 500) = count(value)
       |FROM $half
       |UNION ALL
       |SELECT $batchId, 'values_in(event_type)',
       |  CAST(count(*) FILTER (event_type IN
       |    ('view', 'click', 'purchase', 'error')) AS DOUBLE)
       |    / count(event_type),
       |  count(*) FILTER (event_type IN
       |    ('view', 'click', 'purchase', 'error')) = count(event_type)
       |FROM $half
       |UNION ALL
       |SELECT $batchId, 'row_count(1,100000000)', CAST(count(*) AS DOUBLE),
       |  count(*) BETWEEN 1 AND 100000000 FROM $half""".stripMargin

  private lazy val cdcOracle: String =
      """WITH b AS (
        |  SELECT c_custkey, c_name, c_acctbal, CAST(0 AS BIGINT) AS seq,
        |    'I' AS op
        |  FROM customer
        |), ch AS (
        |  SELECT CASE WHEN o_orderkey % 7 = 3 THEN o_custkey + 1000000
        |           ELSE o_custkey END AS c_custkey,
        |    'n' || o_orderkey AS c_name,
        |    o_totalprice AS c_acctbal,
        |    CAST(o_orderkey + 1 AS BIGINT) AS seq,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D'
        |         WHEN o_orderkey % 7 = 3 THEN 'I'
        |         ELSE 'U' END AS op
        |  FROM orders
        |), u AS (
        |  SELECT * FROM b UNION ALL SELECT * FROM ch
        |), w AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey
        |    ORDER BY seq DESC) AS rn
        |  FROM u
        |)
        |SELECT c_custkey, c_name, c_acctbal FROM w
        |WHERE rn = 1 AND op <> 'D'
        |""".stripMargin
}
