package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 gates — closing the round-10 verdict's asks:
  *
  *  - `a35_ppr_weighted`: seed-restart AND edge-weighted PageRank
  *    ([[graft.bel.PageRank.runPersonalizedWeighted]]) — the two
  *    generalizations compose (restart vector vs transition matrix are
  *    disjoint parts of the recurrence); oracle = the unrolled weighted
  *    recurrence with the a30 personalized restart mass.
  *  - `k22_compact_ingest`: OPTIMIZE-style maintenance for the
  *    streaming-append layout ([[graft.streaming.CuratePipeline
  *    .compactIngest]]) — corpus partitions fold into a sorted archive,
  *    the fingerprint index rewrites sorted, and the batch-partition
  *    replay discipline survives the rewrite.
  *  - `mm_decode_wav` / `mm_wav_rejects`: the REAL audio codec —
  *    RIFF/WAVE 16-bit PCM parse ([[graft.ops.Multimodal.decodeWav]])
  *    with exact integer sample statistics and a corrupt-blob reject
  *    side output, the audio sibling of the PPM image codec.
  *  - `t_url_domain_psl`: registrable domain via a broadcast
  *    public-suffix list ([[graft.ops.TextAnalysis
  *    .urlDomainWithSuffixes]]) — longest-literal-match over staged
  *    label-suffix candidates, heuristic fallback, exercised on
  *    multi-label suffixes the list-free heuristic gets wrong.
  *  - `k23_snapshot_diff`: dataset versioning ([[graft.ops.Cdc
  *    .snapshotDiff]]) — two corpus versions reduce to (key, digest)
  *    per side and one full-outer join yields the delta-sized
  *    added/removed/changed feed.
  *  - `o12_group_quantiles`: exact group-wise continuous quantiles
  *    ([[graft.ops.Rank.groupQuantiles]]) — the precise face of the
  *    a15 sketch profile for quantized domains; one map-side-combinable
  *    aggregation, no window.
  *  - `a36_path_counts`: landmark shortest-path counts
  *    ([[graft.bel.Bfs.pathCounts]]) — the σ stage of Brandes'
  *    betweenness, depth-bounded, exact BIGINT counts via the
  *    level-synchronous delta frontier.
  *  - `a37_weighted_paths`: weighted shortest-path costs
  *    ([[graft.bel.Bfs.weightedHops]]) — min-plus relaxation with the
  *    integral edge weight as the step, exact BIGINT costs, bounded
  *    rounds engine-identical by construction.
  *  - `a38_betweenness`: landmark betweenness centrality
  *    ([[graft.bel.Bfs.landmarkBetweenness]]) — the full Brandes
  *    backward pass over the a36 σ state: shortest-path DAG via one
  *    3-way join, per-level dependency folds, pivot-sampled estimate.
  *  - `w_stream_topk`: the o11 native bounded top-k aggregate as
  *    STREAMING state ([[graft.streaming.EventStreams
  *    .topKPerWindowStream]]) — ≤ k rows per (window, type) key in the
  *    state store regardless of volume.
  *  - `g13_neighbor_fanout`: GraphSAGE minibatch neighborhoods
  *    ([[graft.bel.RandomWalks.neighborFanout]]) — per hop one
  *    frontier join + one bounded top-k, md5-order deterministic draw.
  */
object Round11Queries {
  private type Q = (SparkSession, String) => DataFrame

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

  private val compactMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String,
        (Boolean, Boolean, Boolean, Boolean)]]())

  val queries: Map[String, Q] = Map(

    // --- Personalized AND weighted PageRank ----------------------------------
    // The a30 seed set (r:0 w=3, r:1 w=1 over the reversed dimension
    // graph) with the a32 edge weights (n_nationkey%3+1, s_suppkey%7+1):
    // teleport and dangling mass return to the normalized seed
    // distribution while transitions carry rank·w/out-strength. Same
    // ONE power loop as a17/a30/a32 (PageRank.power — the composition
    // touches disjoint parts of the recurrence, zero new plan shape);
    // same a17 scoping, measured there.
    "a35_ppr_weighted" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      import ss.implicits._
      val rn = t(ss, d, "nation").select(
        concat(lit("r:"), col("n_regionkey")).as("src"),
        concat(lit("n:"), col("n_nationkey")).as("dst"),
        (col("n_nationkey") % 3 + 1).cast("double").as("weight"))
      val ns = t(ss, d, "supplier").select(
        concat(lit("n:"), col("s_nationkey")).as("src"),
        concat(lit("s:"), col("s_suppkey")).as("dst"),
        (col("s_suppkey") % 7 + 1).cast("double").as("weight"))
      val seeds = Seq(("r:0", 3.0), ("r:1", 1.0)).toDF("node", "weight")
      graft.bel.PageRank.runPersonalizedWeighted(rn.unionByName(ns),
        seeds, "weight", iterations = 8)
    }),

    // --- Ingest small-file compaction ----------------------------------------
    // The OPTIMIZE-style maintenance the streaming-append layout needs
    // at 100 TB (one small file set per micro-batch): the curate chain
    // runs two batches, compactIngest folds corpus partitions into the
    // batch_id=-1 archive (N sorted files) and rewrites the fingerprint
    // index to N fingerprint-sorted files. The gate pins the FULL loop:
    // the compacted corpus still equals the batch-chain oracle, file
    // counts are bounded, a replayed pre-compaction batch lands NOTHING
    // (fingerprints all indexed, its partition gone), and a genuinely
    // new post-compaction batch still appends beside the archive.
    "k22_compact_ingest" -> ((s, d) => {
      import s.implicits._
      import graft.streaming.CuratePipeline
      val (chainOk, filesOk, replayOk, appendOk) =
        memo(compactMemo, s, d) { () =>
          val docs = t(s, d, "documents").select("doc_id", "text")
            .filter(col("doc_id") % 10 === 0)
          val b0 = docs.filter(col("doc_id") % 20 === 0)
          val b1 = docs.filter(col("doc_id") % 20 =!= 0)
          val base = s"/tmp/graft_compact_${sfTag(d)}"
          rmrf(s, base)
          val checks = Seq(graft.ops.Expectations.notNull("text"))
          def rules(in: DataFrame): DataFrame =
            in.filter(graft.ops.TextAnalysis.tokenCount(col("text")) >= 5)
          val (idx, out) = (s"$base/idx", s"$base/out")
          CuratePipeline.curateBatch(s, b0, 0L, checks, rules, idx, out)
          CuratePipeline.curateBatch(s, b1, 1L, checks, rules, idx, out)
          def ids() = CuratePipeline.corpus(s, out)
            .select("doc_id").as[Long].collect().toSet
          val want = graft.ops.Dedup.exactSurvivors(rules(docs))
            .select("survivor_id").as[Long].collect().toSet
          val (nc, ni) = CuratePipeline.compactIngest(s, idx, out,
            numFiles = 4)
          val compacted = ids()
          val replay = CuratePipeline.curateBatch(s, b1, 1L, checks,
            rules, idx, out)
          val replayed = ids()
          val fresh = Seq((9000000001L, "six brand new tokens never seen"))
            .toDF("doc_id", "text")
          val m2 = CuratePipeline.curateBatch(s, fresh, 2L, checks,
            rules, idx, out)
          (compacted == want,
            nc <= 4L && ni <= 4L,
            replay.nAccepted == 0L && replayed == want,
            m2.nAccepted == 1L && ids() == (want + 9000000001L))
        }
      Seq((chainOk, filesOk, replayOk, appendOk)).toDF(
        "chain_equals_batch", "files_bounded", "replay_lands_nothing",
        "new_batch_appends")
    }),

    // --- Real audio codec: RIFF/WAVE 16-bit PCM decode gate ------------------
    // wavEncode builds REAL RIFF/WAVE PCM clips whose samples are a pure
    // function of doc_id (with a LIST chunk between fmt and data, so the
    // decoder must walk the chunk grammar); decodeWav parses the actual
    // container inside the batched mapPartitions and emits exact integer
    // sample statistics. The oracle recomputes peak/Σ|s|/Σs² arithmetically
    // from the sample formula, never seeing the bytes — a header-offset,
    // endianness, or interleave bug breaks the hash.
    "mm_decode_wav" -> ((s, d) =>
      graft.ops.Multimodal.decodeWav(
        graft.ops.Multimodal.wavEncode(t(s, d, "documents")))),

    // The corrupt-blob side output: every 7th clip loses its magic,
    // every 7th+1 its sample tail, every 7th+2 gets its fmt audioFormat
    // patched to non-PCM; the reject stream must carry exactly those
    // doc_ids with the stable reason codes the oracle predicts, and no
    // clean row may leak into it.
    "mm_wav_rejects" -> ((s, d) => {
      import graft.ops.Multimodal
      val blobs = Multimodal.wavEncode(t(s, d, "documents"))
      val corrupted = blobs.withColumn("content",
        when(col("doc_id") % 7 === 0,
          concat(lit("X".getBytes("US-ASCII")),
            col("content").substr(lit(2), length(col("content")))))
          .when(col("doc_id") % 7 === 1,
            col("content").substr(lit(1), length(col("content")) - 10))
          .when(col("doc_id") % 7 === 2,
            concat(col("content").substr(lit(1), lit(20)),
              lit(Array(3.toByte)),
              col("content").substr(lit(22),
                length(col("content")) - 21)))
          .otherwise(col("content")))
      Multimodal.decodeWavRejects(corrupted)
    }),

    // --- Registrable domain via a broadcast public-suffix list ---------------
    // The production form of t_url_parse's heuristic: an injected
    // suffix fixture including multi-label suffixes the list-free rule
    // gets WRONG (pvt.k12.ma.us, github.io), longest-literal-match via
    // a broadcast join over staged label-suffix candidates, heuristic
    // fallback for unlisted hosts, host-is-a-suffix edge. The oracle
    // mirrors the candidate/longest-match/fallback logic in SQL over
    // the same VALUES fixture.
    "t_url_domain_psl" -> ((s, d) => {
      import s.implicits._
      val m = col("doc_id") % 8
      val x = (col("doc_id") % 50).cast("string")
      val hosts = t(s, d, "documents").select(
        when(m === 0, concat(lit("s"), x, lit(".pvt.k12.ma.us")))
          .when(m === 1, concat(lit("s"), x, lit(".co.uk")))
          .when(m === 2, concat(lit("s"), x, lit(".github.io")))
          .when(m === 3, concat(lit("www.s"), x, lit(".com")))
          .when(m === 4, lit("co.uk"))
          .when(m === 5, lit("localhost"))
          .when(m === 6, concat(lit("s"), x, lit(".ac.jp")))
          .otherwise(lit("internal.example")).as("host"))
      val suffixes = Seq("com", "org", "net", "uk", "co.uk", "ac.uk",
        "us", "ma.us", "k12.ma.us", "pvt.k12.ma.us", "jp", "ac.jp",
        "io", "github.io", "au", "com.au").toDF("suffix")
      graft.ops.TextAnalysis.urlDomainWithSuffixes(hosts, suffixes)
    }),

    // --- Snapshot diff (dataset versioning) ----------------------------------
    // Two corpus versions → the delta-sized change feed: docs % 13 == 0
    // vanish (removed), % 13 == 1 get edited text (changed), % 13 == 2
    // reappear under new ids (added). Each side reduces to
    // (key, xxhash64(content)) BEFORE the one full-outer join, so the
    // shuffle ships 8-byte digests, never document payloads.
    "k23_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val newSnap = docs.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 13 === 1,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 13 === 2)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.ops.Cdc.snapshotDiff(docs, newSnap, Seq("doc_id"),
        Seq("text"))
    }),

    // --- Landmark shortest-path counts (the σ stage of Brandes) --------------
    // Per (landmark, node): hop distance AND the exact number of
    // distinct shortest paths, depth-bounded at 4 (σ grows as
    // branching^depth — the k-betweenness posture; the cap also keeps
    // both engines inside BIGINT). Level-synchronous delta-frontier
    // over the memoized co-purchase graph; the oracle unrolls the same
    // frontier/visited recurrence 4 levels.
    "a36_path_counts" -> ((s, d) => {
      val landmarks = t(s, d, "part")
        .filter(col("p_partkey") % 97 === 0)
        .select(col("p_partkey").as("seed"))
      graft.bel.Bfs.pathCounts(Round8Queries.coPurchaseEdges(s, d),
          landmarks, maxDepth = 4)
        .select(col("seed").cast("long").as("seed"),
          col("node").cast("long").as("node"), col("hops"),
          col("sigma"))
    }),

    // --- GNN neighbor-fanout sampling ----------------------------------------
    // The GraphSAGE minibatch extractor: 2-hop (3, 2)-fanout sampled
    // neighborhoods of the %199 landmark parts over the co-purchase
    // graph — per hop one frontier join + one bounded top-k (only
    // parents × k rows cross the exchange), the md5-order draw
    // identical in both engines.
    "g13_neighbor_fanout" -> ((s, d) => {
      val seeds = t(s, d, "part")
        .filter(col("p_partkey") % 199 === 0)
        .select(col("p_partkey").as("seed"))
      graft.bel.RandomWalks.neighborFanout(
          Round8Queries.coPurchaseEdges(s, d), seeds, Seq(3, 2))
        .select(col("seed").cast("long").as("seed"), col("hop"),
          col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
    }),

    // --- Streaming windowed top-k --------------------------------------------
    // The o11 native bounded top-k aggregate running INSIDE a
    // watermarked streaming aggregation: per (hour, event_type) the 3
    // largest events, the TopKRowsAgg buffer as the state store's
    // per-key state (≤ k rows regardless of volume — streaming windows
    // don't even admit rank functions). Two time-ordered batches,
    // complete-mode sink; oracle = the batch row_number SQL.
    "w_stream_topk" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val tag = sfTag(d).replace(".", "_")
        val rows = Round6Queries.eventsFeed(ss, d)
          .filter(_._1 % 20 == 0).sortBy(_._2.getTime)
        val mem =
          MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
        val out = graft.streaming.EventStreams.topKPerWindowStream(
          mem.toDS().toDF("event_id", "ts", "user_id", "event_type",
            "value"), k = 3)
        val sink = s"w_stream_topk_$tag"
        ss.catalog.dropTempView(sink)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try {
          val (h1, h2) = rows.splitAt(rows.length / 2)
          mem.addData(h1: _*)
          q.processAllAvailable()
          mem.addData(h2: _*)
          q.processAllAvailable()
        } finally q.stop()
        ss.table(sink).select(
          date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("value"), col("user_id"))
      }),

    // --- Landmark betweenness centrality -------------------------------------
    // The full Brandes composition over the a36 forward state: DAG via
    // one 3-way join, per-level backward dependency folds, source rows
    // excluded. Double δ sums (σ-ratios are inherently fractional) —
    // the PageRank float posture, tolerant-compared.
    "a38_betweenness" -> ((s, d) => {
      val landmarks = t(s, d, "part")
        .filter(col("p_partkey") % 97 === 0)
        .select(col("p_partkey").as("seed"))
      graft.bel.Bfs.landmarkBetweenness(
          Round8Queries.coPurchaseEdges(s, d), landmarks, maxDepth = 4)
        .select(col("node").cast("long").as("node"), col("betweenness"))
    }),

    // --- Weighted shortest-path costs ----------------------------------------
    // Min-plus relaxation with the edge weight as the step: exact
    // BIGINT costs over the co-purchase graph with symmetric integral
    // weights (p1+p2)%7+1, 12 relaxation rounds in BOTH engines (each
    // oracle level IS one relaxOnce, so the bounded-round contract is
    // engine-identical whether or not the fixpoint lands inside it).
    "a37_weighted_paths" -> ((s, d) => {
      val seeds = t(s, d, "part")
        .filter(col("p_partkey") % 97 === 0)
        .select(col("p_partkey").as("seed"))
      val edges = Round8Queries.coPurchaseEdges(s, d)
        .withColumn("w", (col("src") + col("dst")) % 7 + 1)
      graft.bel.Bfs.weightedHops(edges, seeds, "w", maxHops = 12)
        .select(col("node").cast("long").as("node"), col("cost"))
    }),

    // --- Exact group-wise quantiles ------------------------------------------
    // The precise face of the a15 sketch profile: per-returnflag
    // continuous quantiles of the (quantized, low-cardinality) quantity
    // domain — one map-side-combinable hash aggregation, no window, no
    // global sort; value-comparable with ANSI percentile_cont.
    "o12_group_quantiles" -> ((s, d) =>
      graft.ops.Rank.groupQuantiles(
        t(s, d, "lineitem").select("l_returnflag", "l_quantity"),
        Seq("l_returnflag"), "l_quantity", Seq(0.25, 0.5, 0.9))))

  /** The FULL recurrence unrolled — [[Round10Queries]]' pprOracle
    * restart vector composed with its weightedPrOracle transition
    * terms: rank' = (1−d)·s + d·(Σ_in rank·w/outstr + danglingMass·s)
    * over the reversed weighted dimension graph. */
  private def pprWeightedOracle(iters: Int): String = {
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
         |    (1 - 0.85) * v.s + 0.85 * (coalesce(c.c, 0) + d$i.m * v.s)
         |      AS rank
         |  FROM sv v CROSS JOIN d$i
         |  LEFT JOIN c$i c ON c.node = v.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS (
       |  SELECT 'r:' || n_regionkey AS src, 'n:' || n_nationkey AS dst,
       |    CAST(n_nationkey % 3 + 1 AS DOUBLE) AS w
       |  FROM nation
       |  UNION ALL
       |  SELECT 'n:' || s_nationkey, 's:' || s_suppkey,
       |    CAST(s_suppkey % 7 + 1 AS DOUBLE)
       |  FROM supplier
       |), edges AS (
       |  SELECT src, dst, sum(w) AS w FROM raw GROUP BY 1, 2
       |), vertices AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
       |), sv AS (
       |  SELECT node, CASE node WHEN 'r:0' THEN 3.0 / 4.0
       |    WHEN 'r:1' THEN 1.0 / 4.0 ELSE 0.0 END AS s
       |  FROM vertices
       |), outstr AS (
       |  SELECT src, sum(w) AS s FROM edges GROUP BY src
       |), r0 AS (
       |  SELECT node, s AS rank FROM sv
       |),
       |$steps
       |SELECT node, rank FROM r$iters
       |""".stripMargin
  }

  /** Level-synchronous σ recurrence unrolled: frontier f_i = new nodes
    * with summed path counts from f_{i-1}, visited v_i accumulates —
    * the exact delta-frontier form [[graft.bel.Bfs.pathCounts]] runs
    * (a full-frame relaxation would add non-shortest contributions).
    * Shared by the σ gate and the betweenness oracle's forward phase. */
  private def sigmaForwardCtes(levels: Int): String = {
    val steps = (1 to levels).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT f.seed, adj.v AS node,
         |    CAST(sum(f.sigma) AS BIGINT) AS sigma
         |  FROM f${i - 1} f JOIN adj ON f.node = adj.u
         |  GROUP BY 1, 2
         |), f$i AS MATERIALIZED (
         |  SELECT c.seed, c.node, c.sigma
         |  FROM c$i c LEFT JOIN v${i - 1} v
         |    ON v.seed = c.seed AND v.node = c.node
         |  WHERE v.node IS NULL
         |), v$i AS MATERIALIZED (
         |  SELECT seed, node, hops, sigma FROM v${i - 1}
         |  UNION ALL
         |  SELECT seed, node, $i, sigma FROM f$i
         |)""".stripMargin
    }.mkString(",\n")
    s"""li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), e0 AS MATERIALIZED (
       |  SELECT a.pk AS a, b.pk AS b
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |), adj AS MATERIALIZED (
       |  SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0
       |), v0 AS MATERIALIZED (
       |  SELECT p_partkey AS seed, p_partkey AS node, 0 AS hops,
       |    CAST(1 AS BIGINT) AS sigma
       |  FROM part WHERE p_partkey % 97 = 0
       |), f0 AS MATERIALIZED (
       |  SELECT seed, node, sigma FROM v0
       |),
       |$steps""".stripMargin
  }

  private def pathCountsOracle(levels: Int): String =
    s"""WITH ${sigmaForwardCtes(levels)}
       |SELECT CAST(seed AS BIGINT) AS seed, CAST(node AS BIGINT) AS node,
       |  hops, sigma
       |FROM v$levels
       |""".stripMargin

  /** Brandes' backward pass unrolled over the σ forward state: the
    * shortest-path DAG as one 3-way join, then per-level dependency
    * folds δ(v) = Σ ratio·(1+δ(w)) from the deepest level down —
    * exactly the per-level joins [[graft.bel.Bfs.landmarkBetweenness]]
    * runs. Level `levels` enters with δ = 0 (reached, no successors in
    * bound); level 0 (v = s) is excluded. */
  private def betweennessOracle(levels: Int): String = {
    val back = ((levels - 1) to 1 by -1).map { i =>
      s"""del$i AS MATERIALIZED (
         |  SELECT l.seed, l.node, coalesce(c.delta, 0) AS delta
         |  FROM (SELECT seed, node FROM v$levels WHERE hops = $i) l
         |  LEFT JOIN (
         |    SELECT g.seed, g.v AS node,
         |      sum(g.ratio * (1 + dn.delta)) AS delta
         |    FROM dag g JOIN del${i + 1} dn
         |      ON dn.seed = g.seed AND dn.node = g.w
         |    WHERE g.hv = $i GROUP BY 1, 2) c
         |  ON c.seed = l.seed AND c.node = l.node
         |)""".stripMargin
    }.mkString(",\n")
    val union = (levels to 1 by -1)
      .map(i => s"SELECT seed, node, delta FROM del$i")
      .mkString("\n      UNION ALL ")
    s"""WITH ${sigmaForwardCtes(levels)},
       |dag AS MATERIALIZED (
       |  SELECT a.seed, a.node AS v, b.node AS w, a.hops AS hv,
       |    CAST(a.sigma AS DOUBLE) / b.sigma AS ratio
       |  FROM v$levels a
       |  JOIN adj ON a.node = adj.u
       |  JOIN v$levels b ON b.seed = a.seed AND b.node = adj.v
       |    AND b.hops = a.hops + 1
       |), del$levels AS MATERIALIZED (
       |  SELECT seed, node, CAST(0 AS DOUBLE) AS delta
       |  FROM v$levels WHERE hops = $levels
       |),
       |$back
       |SELECT CAST(node AS BIGINT) AS node, sum(delta) AS betweenness
       |FROM ($union)
       |GROUP BY 1
       |""".stripMargin
  }

  /** The min-plus relaxation unrolled with per-edge weights — each
    * level is exactly one [[graft.bel.Bfs.relaxOnce]] with the weight
    * step, so a bounded round count is engine-identical whether or not
    * the fixpoint lands inside it. */
  private def weightedPathsOracle(levels: Int): String = {
    val steps = (1 to levels).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, min(cost) AS cost FROM (
         |    SELECT node, cost FROM d${i - 1}
         |    UNION ALL
         |    SELECT adjw.v, d${i - 1}.cost + adjw.w
         |    FROM d${i - 1} JOIN adjw ON d${i - 1}.node = adjw.u)
         |  GROUP BY 1
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
       |), d0 AS MATERIALIZED (
       |  SELECT p_partkey AS node, CAST(0 AS BIGINT) AS cost FROM part
       |  WHERE p_partkey % 97 = 0
       |),
       |$steps
       |SELECT CAST(node AS BIGINT) AS node, CAST(cost AS BIGINT) AS cost
       |FROM d$levels
       |""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "a35_ppr_weighted" -> pprWeightedOracle(8),

    "a36_path_counts" -> pathCountsOracle(4),

    "a37_weighted_paths" -> weightedPathsOracle(12),

    "a38_betweenness" -> betweennessOracle(4),

    "g13_neighbor_fanout" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e0 AS MATERIALIZED (
        |  SELECT a.pk AS a, b.pk AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), adj AS MATERIALIZED (
        |  SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0
        |), f0 AS MATERIALIZED (
        |  SELECT p_partkey AS seed, p_partkey AS node FROM part
        |  WHERE p_partkey % 199 = 0
        |), p1 AS MATERIALIZED (
        |  SELECT seed, u, v FROM (
        |    SELECT f0.seed, adj.u, adj.v, row_number() OVER (
        |      PARTITION BY f0.seed, adj.u
        |      ORDER BY md5(adj.u || ':1:' || adj.v), adj.v) AS rn
        |    FROM f0 JOIN adj ON f0.node = adj.u)
        |  WHERE rn <= 3
        |), f1 AS MATERIALIZED (
        |  SELECT DISTINCT seed, v AS node FROM p1
        |), p2 AS MATERIALIZED (
        |  SELECT seed, u, v FROM (
        |    SELECT f1.seed, adj.u, adj.v, row_number() OVER (
        |      PARTITION BY f1.seed, adj.u
        |      ORDER BY md5(adj.u || ':2:' || adj.v), adj.v) AS rn
        |    FROM f1 JOIN adj ON f1.node = adj.u)
        |  WHERE rn <= 2
        |)
        |SELECT CAST(seed AS BIGINT) AS seed, 1 AS hop,
        |  CAST(u AS BIGINT) AS src, CAST(v AS BIGINT) AS dst
        |FROM p1
        |UNION ALL
        |SELECT CAST(seed AS BIGINT), 2, CAST(u AS BIGINT),
        |  CAST(v AS BIGINT)
        |FROM p2
        |""".stripMargin,

    "w_stream_topk" ->
      """WITH e AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
        |    event_type, value
        |  FROM events WHERE event_id % 20 = 0
        |), r AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, value,
        |    user_id,
        |    row_number() OVER (
        |      PARTITION BY date_trunc('hour', ts), event_type
        |      ORDER BY value DESC, user_id DESC, ts DESC,
        |        event_id DESC) AS rn
        |  FROM e
        |)
        |SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  value, user_id
        |FROM r WHERE rn <= 3
        |""".stripMargin,

    "k22_compact_ingest" ->
      ("SELECT true AS chain_equals_batch, true AS files_bounded, " +
        "true AS replay_lands_nothing, true AS new_batch_appends"),

    "mm_decode_wav" ->
      """WITH spec AS (
        |  SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS n_channels,
        |    16 + doc_id % 9 AS frames
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, n_channels, frames,
        |    CAST(unnest(range(frames * n_channels)) AS BIGINT) AS i
        |  FROM spec
        |), sm AS (
        |  SELECT doc_id, n_channels, frames,
        |    ((doc_id * 131 + (i // n_channels) * 17 + (i % n_channels) * 71)
        |      % 65536) - 32768 AS s
        |  FROM px
        |)
        |SELECT doc_id, n_channels, CAST(8000 AS INT) AS sample_rate,
        |  CAST(frames AS INT) AS n_frames,
        |  CAST(max(abs(s)) AS BIGINT) AS peak,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
        |  CAST(sum(s * s) AS BIGINT) AS sum_sq
        |FROM sm GROUP BY 1, 2, 3, 4
        |""".stripMargin,

    "mm_wav_rejects" ->
      ("SELECT doc_id, CASE doc_id % 7 WHEN 0 THEN 'bad_magic' " +
        "WHEN 1 THEN 'truncated' ELSE 'bad_fmt' END AS reason " +
        "FROM documents WHERE doc_id % 7 <= 2"),

    "t_url_domain_psl" ->
      """WITH hosts AS (
        |  SELECT DISTINCT CASE doc_id % 8
        |    WHEN 0 THEN 's' || (doc_id % 50) || '.pvt.k12.ma.us'
        |    WHEN 1 THEN 's' || (doc_id % 50) || '.co.uk'
        |    WHEN 2 THEN 's' || (doc_id % 50) || '.github.io'
        |    WHEN 3 THEN 'www.s' || (doc_id % 50) || '.com'
        |    WHEN 4 THEN 'co.uk'
        |    WHEN 5 THEN 'localhost'
        |    WHEN 6 THEN 's' || (doc_id % 50) || '.ac.jp'
        |    ELSE 'internal.example' END AS host
        |  FROM documents
        |), sfx AS (
        |  SELECT * FROM (VALUES ('com'),('org'),('net'),('uk'),('co.uk'),
        |    ('ac.uk'),('us'),('ma.us'),('k12.ma.us'),('pvt.k12.ma.us'),
        |    ('jp'),('ac.jp'),('io'),('github.io'),('au'),('com.au'))
        |    AS t(suffix)
        |), lab AS (
        |  SELECT host, string_split(host, '.') AS labels,
        |    len(string_split(host, '.')) AS n
        |  FROM hosts
        |), cand AS (
        |  SELECT host, n, k,
        |    array_to_string(labels[n - k + 1 : n], '.') AS cand
        |  FROM lab, (SELECT unnest(range(1, 6)) AS k) ks
        |  WHERE k <= least(n, 5)
        |), m AS (
        |  SELECT host, max(k) AS k
        |  FROM cand JOIN sfx ON cand.cand = sfx.suffix
        |  GROUP BY host
        |), heur AS (
        |  SELECT host, CASE WHEN length(d) > 0 THEN d ELSE host END AS h
        |  FROM (
        |    SELECT host, CASE WHEN regexp_matches(host,
        |        '\.(co|com|org|net|ac|gov|edu)\.[a-z][a-z]$')
        |      THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
        |      ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1) END AS d
        |    FROM hosts)
        |)
        |SELECT l.host,
        |  CASE WHEN m.k IS NULL THEN heur.h
        |    WHEN m.k >= l.n THEN l.host
        |    ELSE array_to_string(l.labels[l.n - m.k : l.n], '.')
        |  END AS registrable_domain
        |FROM lab l
        |LEFT JOIN m ON m.host = l.host
        |JOIN heur ON heur.host = l.host
        |""".stripMargin,

    "k23_snapshot_diff" ->
      """SELECT doc_id, 'removed' AS change FROM documents
        |WHERE doc_id % 13 = 0
        |UNION ALL
        |SELECT doc_id, 'changed' FROM documents WHERE doc_id % 13 = 1
        |UNION ALL
        |SELECT doc_id + 1000000, 'added' FROM documents
        |WHERE doc_id % 13 = 2
        |""".stripMargin,

    "o12_group_quantiles" ->
      """SELECT l_returnflag, CAST(0.25 AS DOUBLE) AS p,
        |  quantile_cont(l_quantity, 0.25) AS q
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, CAST(0.5 AS DOUBLE),
        |  quantile_cont(l_quantity, 0.5)
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_returnflag, CAST(0.9 AS DOUBLE),
        |  quantile_cont(l_quantity, 0.9)
        |FROM lineitem GROUP BY 1
        |""".stripMargin)
}
