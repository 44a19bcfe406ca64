package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 extension gates, second batch — the linear-algebra /
  * behavior-modeling additions beyond the verdict's asks:
  *
  *  - `s_pca_gram`: the distributed half of a PCA fit
  *    ([[graft.ops.Pca.gramExact]]) — quantized second-moment matrix,
  *    BIGINT-exact vs the same sums in SQL.
  *  - `s_pca_invariants`: the eigensolve half ([[graft.ops.Pca.fit]] /
  *    [[graft.ops.Pca.whiten]]) — orthonormal components, sorted
  *    spectrum, trace preservation, and identity covariance after
  *    whitening; the s_lsh_recall boolean-invariant posture (an
  *    eigendecomposition is not SQL-expressible, its defining algebraic
  *    properties are machine-checkable).
  *  - `o13_weighted_sample`: weighted sampling without replacement via
  *    priority sampling ([[graft.ops.TrainingPrep.prioritySample]],
  *    Duffield–Lund–Thorup JACM 2007) — selection-set-exact vs the SQL
  *    oracle because the priority is one IEEE division of the md5-draw
  *    integers, never a libm call.
  *  - `a39_transitions`: first-order Markov transition counts over
  *    per-user event sequences ([[graft.ops.Funnel.transitionCounts]])
  *    — exact BIGINT counts + per-source totals.
  *  - `w_anomaly_zscore`: rolling z-score outlier flags
  *    ([[graft.ops.Anomaly.flagOutliers]]) — the sigma test run in
  *    BIGINT algebra (no sqrt, no division), bit-exact vs the window
  *    SQL.
  *  - `w_stream_anomaly`: the same flags from the STREAMING face
  *    ([[graft.streaming.AnomalyStream]]) — watermark-sealed rolling
  *    windows, flushed by the sentinel discipline, equal to the batch
  *    SQL on the same feed.
  */
object Round11bQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  private def sfTag(d: String): String =
    new java.io.File(d).getName.replace(".", "_")

  val queries: Map[String, Q] = Map(

    // --- PCA: the distributed stage, integer-exact ---------------------------
    // One explode + one map-side-combined hash aggregation produce the
    // d(d+1)/2 quantized second-moment cells — the ONLY corpus-sized
    // work in a PCA fit. floor-quantization (never half-up rounding)
    // keeps the BIGINT sums engine-identical.
    "s_pca_gram" -> ((s, d) =>
      graft.ops.Pca.gramExact(t(s, d, "embeddings"))),

    // --- PCA: the eigensolve stage, invariant-gated ---------------------------
    // The driver-side Jacobi eigensolve is not SQL-expressible; its
    // defining properties are: components orthonormal, spectrum sorted
    // and PSD-nonnegative, trace preserved (Σλ = Σ per-dim variance),
    // and — the whole point of the operator — the whitened corpus has
    // identity covariance. All four checked against the live corpus,
    // the s_lsh_recall boolean posture.
    "s_pca_invariants" -> ((s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings")
      val model = graft.ops.Pca.fit(emb)
      val dm = model.dim
      val comps = model.components
      def dot(a: Array[Double], b: Array[Double]): Double =
        a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
      val orthoOk = (0 until dm).forall(i => (i until dm).forall { j =>
        math.abs(dot(comps(i), comps(j)) - (if (i == j) 1.0 else 0.0)) <
          1e-8
      })
      val eigSortedOk =
        model.eigvals.zip(model.eigvals.tail).forall { case (a, b) =>
          a >= b - 1e-12
        } && model.eigvals.last > -1e-8
      // trace: Σ eigvals == Σ per-dimension population variance
      val varSum = emb
        .select(posexplode(graft.functions.Vectors.toDouble(
          col("embedding"))).as(Seq("dim", "e")))
        .groupBy("dim").agg(var_pop("e").as("v"))
        .agg(sum("v")).collect()(0).getDouble(0)
      val traceOk =
        math.abs(model.eigvals.sum - varSum) <= 1e-6 * math.abs(varSum)
      // whitening: covariance of the whitened top-8 corpus ≈ I
      val wcov = graft.ops.Pca
        .covariance(graft.ops.Pca.whiten(emb, model, k = 8))
        .collect()
      val whitenOk = wcov.nonEmpty && wcov.forall { r =>
        val expect = if (r.getInt(1) == r.getInt(0)) 1.0 else 0.0
        math.abs(r.getDouble(2) - expect) < 1e-6
      }
      Seq((orthoOk, eigSortedOk, traceOk, whitenOk))
        .toDF("ortho_ok", "eig_sorted_ok", "trace_ok", "whiten_ok")
    }),

    // --- k-truss decomposition --------------------------------------------------
    // Support peeling with a genuine multi-round cascade: per 16-key
    // part group, a planted 5-clique (edge support 3 — survives k=4
    // forever) and a "bowtie" (hub edge in TWO triangles whose wing
    // edges each sit in one): round 1 peels the wings (support 1),
    // round 2 peels the now-naked hub (support 2 → 0) — the driver
    // corpora's natural graphs are truss-degenerate (co-supply is
    // near-complete at sf0.01, co-purchase triangle-sparse), so the
    // gate plants the regime the operator serves, the s_lsh_recall
    // posture. Bounded-round contract: maxRounds = 3 here, and each
    // oracle level IS one peel (the a37 discipline); the operator
    // early-stops at the round-2 fixpoint.
    // 8-partition + AQE-off scoping: the peel loop's per-round joins run
    // on a dimension-sized edge list (the a31/a35 iterative-loop
    // posture; measured 12.6 → ~4 s at sf0.1 — 32-partition task
    // overhead dominated every round)
    "a40_ktruss" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      val p = t(ss, d, "part").select(col("p_partkey").as("pk"),
        (col("p_partkey") % 16).as("m"),
        expr("p_partkey div 16").as("g"))
      val pairs = p.select(col("g"), col("pk").as("src"), col("m").as("m1"))
        .join(p.select(col("g"), col("pk").as("dst"), col("m").as("m2")),
          "g")
        .filter(col("m1") < col("m2"))
      val edges = pairs.filter(
        col("m2") <= 4 ||
          (col("m1") >= 5 && col("m2") <= 8 &&
            !(col("m1") === 7 && col("m2") === 8)))
        .select("src", "dst")
      graft.bel.KTruss.run(edges, k = 4, maxRounds = 3)
        .select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"))
    }),

    // --- Incremental Gram maintenance -------------------------------------------
    // fold(gram(evens), gram(odds)) must equal gram(corpus) BIT-EXACTLY
    // (moment sums are pure integer additions) — the streaming upkeep
    // path for covariance/PCA: the persisted index is the KB-sized cell
    // matrix, each ingest batch folds in, the corpus never re-scans.
    // Oracle = the s_pca_gram SQL verbatim over the full corpus.
    "s_pca_gram_fold" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.ops.Pca.foldGram(
        graft.ops.Pca.gramExact(emb.filter(col("vec_id") % 2 === 0)),
        graft.ops.Pca.gramExact(emb.filter(col("vec_id") % 2 === 1)))
    }),

    // --- Whitened-PQ composition --------------------------------------------------
    // The reason Pca exists in an ANN stack (whitened residuals
    // quantize better — Jégou PQ §V): the s_pq_recall harness run in
    // WHITENED space end-to-end — whiten the twin corpus (top-32 axes),
    // truth = brute force on the whitened vectors, PQ trained and
    // probed there too; recall ≥ 0.9 pins the composition plumbing
    // (fit → whiten → train → ADC) and that whitening kept the planted
    // twins nearest (the 1e-3 perturbation survives the 1/√λ scaling
    // because the driver spectrum is near-flat).
    "s_pq_whitened_recall" -> ((s, d) => {
      import graft.ops.{Pca, ProductQuantization}
      val corpus = Round6Queries.twinCorpus(t(s, d, "embeddings"))
      val model = Pca.fit(corpus)
      val white = Pca.whiten(corpus, model, k = 32)
      val qs = white.filter(col("vec_id") < 16)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val truth = graft.ops.Similarity.bruteForceTopK(white, qs, k = 1)
        .select("query_id", "id")
      val cb = ProductQuantization.train(white, m = 8, k = 16,
        iterations = 4)
      val pq = ProductQuantization.adcTopK(white, cb, qs, k = 1,
        rerankFrom = 32).select("query_id", "id")
      val hits = truth.join(pq, Seq("query_id", "id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      val total = truth.agg(count(lit(1)).as("n_true"))
      hits.crossJoin(total).select(
        (col("n_hit").cast("double") / col("n_true") >= 0.9)
          .as("whitened_recall_ok"))
    }),

    // --- Degree assortativity ------------------------------------------------------
    // Newman's mixing coefficient over the co-purchase graph: all five
    // sums exact BIGINTs over directed endpoint-degree pairs; r is one
    // IEEE division of exact integers — even the float matches
    // bit-for-bit.
    "a41_assortativity" -> ((s, d) =>
      graft.bel.Assortativity.degreeAssortativity(
        Round8Queries.coPurchaseEdges(s, d))),

    // --- Windowed audio energy -------------------------------------------------------
    // parseWav's exact statistics folded per 8-frame window (the
    // silence-trim / clipping-scan profile): same container walk, same
    // sample formula oracle, now time-localized; the tail window is
    // short and must say so.
    "mm_wav_energy" -> ((s, d) =>
      graft.ops.Multimodal.wavEnergyWindows(
        graft.ops.Multimodal.wavEncode(t(s, d, "documents")),
        windowFrames = 8)),

    // --- Nearest-centroid classification -----------------------------------------
    // Rocchio weak labeling with EXACT arithmetic: centroids stay
    // integer (sum, count) pairs, the squared-euclidean argmin
    // multiplies through by n_c², ties break by label — assignment is
    // deterministic in any IEEE engine, never a float-mean coin flip.
    // One aggregation to the 10×64 centroid frame; assignment is a
    // narrow broadcast-literal HOF pass.
    "s_centroid_classify" -> ((s, d) =>
      graft.ops.Similarity.centroidClassify(t(s, d, "embeddings"))),

    // --- Equi-width histogram --------------------------------------------------------
    // Fixed-bin value distribution per event type: bin = floor(v/25) —
    // IEEE division + floor, exact counts, no quantization step.
    "a42_histogram" -> ((s, d) =>
      graft.ops.Profile.equiWidthHistogram(
        graft.core.Tables.events(s, d), "event_type", "value",
        binWidth = 25.0)),

    // --- Leakage-safe split under duplication --------------------------------------
    // Exact copies draw their split from the cluster's min-id
    // representative, so a re-crawled duplicate of a test document can
    // never land in train — the contamination mode plain per-id
    // splitting has. The documents corpus HAS exact duplicates
    // (d_exact_dedup's clusters), so the rep ≠ id path is live.
    "d_safe_split" -> ((s, d) =>
      graft.ops.TrainingPrep.leakageSafeSplit(t(s, d, "documents"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "cluster_rep", "split")),

    // --- Hour-of-day seasonal baseline ------------------------------------------------
    // The diurnal profile per event type: exact BIGINT (n, Σq, Σq²)
    // per (type, hour) — one map-side-combined aggregation onto the
    // 5×24 domain; mean/σ derive downstream.
    "a44_seasonal" -> ((s, d) =>
      graft.ops.Temporal.seasonalProfile(
        graft.core.Tables.events(s, d))),

    // --- Per-group exact mode -----------------------------------------------------------
    // "Typical value" profiling: most frequent user per event type,
    // ties to the smallest id — one orderable-struct MIN, no window.
    "o16_mode" -> ((s, d) =>
      graft.ops.Rank.modeBy(graft.core.Tables.events(s, d),
        keys = Seq("event_type"), valueCol = "user_id")),

    // --- Mutual nearest neighbors --------------------------------------------------------
    // Reciprocal top-1 matching on the planted-twin corpus: every
    // vector's cosine NN is its twin BY CONSTRUCTION, so the matcher
    // must recover (almost exactly) the planted pair set and nothing
    // else — the s_lsh_recall invariant posture (float argmax is not
    // hash-gateable; its defining property is). The REGISTERED path is
    // the ANN composition (IVF-probed top-1 → reciprocal semi-join, no
    // corpus broadcast, no nested-loop product — the r11 verdict's top
    // ask); a twin sits ~1e-3 from its query and therefore inside the
    // query's own top-probed Voronoi cell (the s_ivf_refined_recall
    // argument), so the invariant holds at nProbe << nList. Honest
    // recall vs the brute pairs on the RAW corpus is s_mutual_nn_ann.
    "s_mutual_nn" -> ((s, d) => {
      val corpus = Round6Queries.twinCorpus(t(s, d, "embeddings"))
      val planted = t(s, d, "embeddings").count()
      // ONE aggregation over ONE evaluation of the top-1 pass
      graft.ops.Similarity.mutualTopOneAnn(corpus, nList = 16, nProbe = 4)
        .agg(
          sum(when(col("b") === col("a") + 1000000L, 1L).otherwise(0L))
            .as("n_hit"),
          sum(when(col("b") =!= col("a") + 1000000L, 1L).otherwise(0L))
            .as("n_extra"))
        .select(
          (col("n_hit").cast("double") / planted >= 0.95).as("mutual_ok"),
          (col("n_extra").cast("double") / planted <= 0.05)
            .as("precision_ok"))
    }),

    // --- Sentence segmentation --------------------------------------------------------
    // Rule-based segmenter ([.!?]+\s+ — RE2-safe, oracle runs it
    // verbatim); indices assigned before the whitespace-fragment drop
    // so they're stable positions; exact word counts per sentence.
    // Terminator markers are APPENDED to every row (the t_redact
    // posture — the synthetic corpus has no sentence punctuation, so
    // the raw table would never exercise the split): multi-terminator
    // runs, double spaces, and a trailing "? " whose empty fragment
    // must drop while keeping earlier indices.
    "t_sentences" -> ((s, d) =>
      graft.ops.TextAnalysis.sentences(
        t(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(". Second one!! Third?  Fourth bit? ")).as("text")))),

    // --- Percent-rank normalization ----------------------------------------------------
    // Distribution-free per-flag feature scaling: integer rank, one
    // IEEE division — even the float is engine-bit-identical.
    "o15_pct_rank" -> ((s, d) =>
      graft.ops.Rank.percentRankBy(t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_returnflag",
            "l_quantity"),
        keys = Seq("l_returnflag"), valueCol = "l_quantity")),

    // --- Per-group quantile winsorization -----------------------------------------
    // Feature clipping at exact per-flag [p5, p95] bounds: one
    // aggregation to the group-sized bounds frame, broadcast back, the
    // corpus never shuffles. Same percentile/quantile_cont parity as
    // o12.
    "o14_winsorize" -> ((s, d) =>
      graft.ops.Rank.winsorize(t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_returnflag",
            "l_quantity"),
        keys = Seq("l_returnflag"), valueCol = "l_quantity",
        lo = 0.05, hi = 0.95)),

    // --- Streaming covariance/PCA maintenance ---------------------------------------
    // The CcStream posture for linear algebra: two embedding
    // micro-batches each land their KB-sized quantized moment-cell
    // partition (provenance-keyed batch_id overwrite = replay-
    // idempotent); the read-time fold must equal the batch gram of the
    // full corpus BIT-EXACTLY — same SQL oracle as s_pca_gram.
    "w_stream_pca" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val rows = t(ss, d, "embeddings")
          .select(col("vec_id"), col("embedding"))
          .as[(Long, Seq[Float])].collect().toSeq
        val path = s"/tmp/graft_pca_stream_${sfTag(d)}"
        graft.core.Fs.delete(ss, path)
        val mem = MemoryStream[(Long, Seq[Float])]
        val q = graft.streaming.PcaStream.maintainGram(
          mem.toDS().toDF("vec_id", "embedding"), path)
        try {
          val (h1, h2) = rows.partition(_._1 % 2 == 0)
          mem.addData(h1: _*); q.processAllAvailable()
          mem.addData(h2: _*); q.processAllAvailable()
        } finally q.stop()
        graft.streaming.PcaStream.readGram(ss, path)
      }),

    // --- Trussness decomposition ---------------------------------------------------
    // Max-k-per-edge over the a40 planted structures plus a
    // triangle-free tail pair per group: K5 edges are trussness 5,
    // bowtie edges 3, tails 2 — the ascending-k peel must recover all
    // three levels. Oracle = one unrolled peel chain PER k (3, 4, 5)
    // from the same base, trussness by first-survivor CASE — every
    // level engine-identical, the a37/a40 bounded-round discipline.
    "a43_trussness" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      val p = t(ss, d, "part").select(col("p_partkey").as("pk"),
        (col("p_partkey") % 16).as("m"),
        expr("p_partkey div 16").as("g"))
      val pairs = p.select(col("g"), col("pk").as("src"), col("m").as("m1"))
        .join(p.select(col("g"), col("pk").as("dst"), col("m").as("m2")),
          "g")
        .filter(col("m1") < col("m2"))
      val edges = pairs.filter(
        col("m2") <= 4 ||
          (col("m1") >= 5 && col("m2") <= 8 &&
            !(col("m1") === 7 && col("m2") === 8)) ||
          (col("m1") === 9 && col("m2") === 10))
        .select("src", "dst")
      graft.bel.KTruss.trussness(edges, maxK = 8)
        .select(col("a").cast("long").as("a"),
          col("b").cast("long").as("b"), col("trussness"))
    }),

    // --- Weighted sampling without replacement --------------------------------
    // 25 documents sampled proportional to length via priority sampling:
    // q = w·10⁶/draw, top-k, ties by id. The sample SET is exact vs the
    // oracle (IEEE division of exact integers); output keeps the integer
    // witnesses (w, draw), never the float priority.
    "o13_weighted_sample" -> ((s, d) =>
      graft.ops.TrainingPrep.prioritySample(
        t(s, d, "documents"), k = 25, weight = col("n_chars"))),

    // --- Markov transition counts ----------------------------------------------
    // Per-user next-event transition matrix over the full event log —
    // the behavior-modeling aggregate. (ts, event_id) ordering makes
    // same-µs pairs deterministic in both engines.
    "a39_transitions" -> ((s, d) =>
      graft.ops.Funnel.transitionCounts(
        graft.core.Tables.events(s, d))),

    // --- Rolling z-score outliers (batch) --------------------------------------
    // Every event judged against its user's 20 preceding values: the
    // |x−μ| > 3σ test multiplied through by cnt² runs entirely in
    // BIGINT (floor-quantized ×1000 values) — bit-exact vs the window
    // SQL, no float accumulation anywhere.
    "w_anomaly_zscore" -> ((s, d) =>
      graft.ops.Anomaly.flagOutliers(graft.core.Tables.events(s, d))
        .select(col("user_id"), col("event_id"), col("q"), col("cnt"),
          col("s"), col("ss"), col("is_outlier"))),

    // --- Markov transitions (streaming face) -------------------------------------
    // The a39 matrix from watermark-sealed state: a pair is final when
    // its LATER event seals, so the observation feed equals the batch
    // lead-window pairs; counts compose downstream over the sink (the
    // batch face's own aggregation shape). Same feed/flush discipline
    // as w_stream_anomaly.
    "w_stream_transitions" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val rows = Round6Queries.eventsFeed(ss, d)
          .filter(_._1 % 20 == 0)
          .map(r => (r._1, r._2, r._3, r._4)) // (event_id, ts, user, type)
        val mem =
          MemoryStream[(Long, java.sql.Timestamp, Long, String)]
        val out = graft.streaming.TransitionStream.transitionsStream(
          mem.toDS().toDF("event_id", "ts", "user_id", "event_type"))
        val sink = s"w_stream_transitions_${sfTag(d)}"
        ss.catalog.dropTempView(sink)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          val times = rows.map(_._2.getTime)
          val cut = times.min + (times.max - times.min) / 2
          mem.addData(rows.filter(_._2.getTime < cut): _*)
          q.processAllAvailable()
          mem.addData(rows.filter(_._2.getTime >= cut): _*)
          q.processAllAvailable()
          mem.addData((-1L,
            new java.sql.Timestamp(times.max + 30L * 86400000L), -1L, "x"))
          q.processAllAvailable()
        } finally q.stop()
        val counts = ss.table(sink).filter(col("user_id") =!= -1L)
          .groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("n"))
        counts.withColumn("from_total",
          sum("n").over(org.apache.spark.sql.expressions.Window
            .partitionBy("from_type")))
      }),

    // --- Rolling z-score outliers (streaming face) ------------------------------
    // The same flags from watermark-sealed state: two time-ordered
    // batches split at a common boundary (nothing below the post-batch
    // watermark), then the far-future sentinel seals every window — the
    // w_stream_asof flush discipline. Every 20th event keeps the feed
    // micro-batch-sized; the oracle is the batch window SQL over the
    // same subset.
    "w_stream_anomaly" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        val rows = Round6Queries.eventsFeed(ss, d)
          .filter(_._1 % 20 == 0)
          .map(r => (r._1, r._2, r._3, r._5)) // (event_id, ts, user, value)
        val mem =
          MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
        val out = graft.streaming.AnomalyStream.flagOutliersStream(
          mem.toDS().toDF("event_id", "ts", "user_id", "value"))
        val sink = s"w_stream_anomaly_${sfTag(d)}"
        ss.catalog.dropTempView(sink)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          val times = rows.map(_._2.getTime)
          val cut = times.min + (times.max - times.min) / 2
          mem.addData(rows.filter(_._2.getTime < cut): _*)
          q.processAllAvailable()
          mem.addData(rows.filter(_._2.getTime >= cut): _*)
          q.processAllAvailable()
          mem.addData((-1L,
            new java.sql.Timestamp(times.max + 30L * 86400000L), -1L, 0.0))
          q.processAllAvailable()
        } finally q.stop()
        ss.table(sink).filter(col("user_id") =!= -1L)
      }))

  private def anomalySql(filter: String): String =
    s"""WITH b AS (
       |  SELECT user_id, ts, event_id,
       |    CAST(floor(value * 1000) AS BIGINT) AS q
       |  FROM events$filter
       |), w AS (
       |  SELECT user_id, event_id, q,
       |    CAST(count(*) OVER win AS BIGINT) AS cnt,
       |    CAST(coalesce(sum(q) OVER win, 0) AS BIGINT) AS s,
       |    CAST(coalesce(sum(q * q) OVER win, 0) AS BIGINT) AS ss
       |  FROM b
       |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
       |)
       |SELECT user_id, event_id, q, cnt, s, ss,
       |  cnt >= 8 AND
       |    (cnt * q - s) * (cnt * q - s) > 9 * (cnt * ss - s * s)
       |    AS is_outlier
       |FROM w
       |""".stripMargin

  private val gramSql: String =
    """WITH q AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      |  FROM embeddings
      |), e AS (
      |  SELECT vec_id, unnest(qv) AS qx,
      |    CAST(unnest(generate_series(1, len(qv))) - 1 AS INT) AS i
      |  FROM q
      |)
      |SELECT a.i AS i, b.i AS j,
      |  CAST(sum(a.qx * b.qx) AS BIGINT) AS s_xy,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
      |GROUP BY 1, 2
      |""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "s_pca_gram" -> gramSql,

    // pure integer addition is associative: the folded halves must hit
    // the full-corpus sums bit-for-bit
    "s_pca_gram_fold" -> gramSql,

    "s_pq_whitened_recall" -> "SELECT true AS whitened_recall_ok",

    // read-time fold across batch partitions ≡ the one-shot gram
    "w_stream_pca" -> gramSql,

    "s_centroid_classify" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS INT) AS label,
        |    CAST(unnest(generate_series(1, len(embedding))) - 1 AS INT)
        |      AS i,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100000)
        |      AS BIGINT) AS q
        |  FROM embeddings
        |), c AS (
        |  SELECT label AS cl, i, CAST(sum(q) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2
        |), dist AS (
        |  SELECT e.vec_id, c.cl,
        |    CAST(sum((c.n * e.q - c.s) * (c.n * e.q - c.s)) AS DOUBLE)
        |      / CAST(max(c.n) * max(c.n) AS DOUBLE) AS cost
        |  FROM e JOIN c ON c.i = e.i
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT vec_id, cl,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cost, cl)
        |      AS rn
        |  FROM dist
        |)
        |SELECT v.vec_id, CAST(v.label AS INT) AS label,
        |  r.cl AS label_pred
        |FROM embeddings v JOIN r ON r.vec_id = v.vec_id AND r.rn = 1
        |""".stripMargin,

    "t_sentences" ->
      """WITH sp AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(
        |      text || '. Second one!! Third?  Fourth bit? ',
        |      '[.!?]+\s+') AS ss
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id, unnest(ss) AS sentence,
        |    CAST(unnest(generate_series(1, len(ss))) - 1 AS INT)
        |      AS sent_idx
        |  FROM sp
        |)
        |SELECT doc_id, sent_idx, sentence,
        |  CAST(len(string_split_regex(trim(sentence), '\s+')) AS BIGINT)
        |    AS n_words
        |FROM ex WHERE trim(sentence) <> ''
        |""".stripMargin,

    "d_safe_split" ->
      (s"""WITH reps AS (
         |  SELECT md5(${Queries.normSql}) AS fp, min(doc_id) AS rep
         |  FROM documents GROUP BY 1
         |), j AS (
         |  SELECT d.doc_id, r.rep AS cluster_rep,
         |    (('0x' || substring(md5(CAST(r.rep AS VARCHAR) || ':split'),
         |      1, 8))::BIGINT % 1000000) / 1000000.0 AS u
         |  FROM documents d
         |  JOIN reps r ON md5(${Queries.normSql.replace("text", "d.text")})
         |    = r.fp
         |)
         |SELECT doc_id, cluster_rep, CASE WHEN u < 0.8 THEN 'train'
         |  WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
         |FROM j
         |""").stripMargin,

    "a44_seasonal" ->
      """SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS INT)
        |    AS hod,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(q) AS BIGINT) AS s,
        |  CAST(sum(q * q) AS BIGINT) AS ss
        |FROM (SELECT event_type, ts,
        |  CAST(floor(value * 1000) AS BIGINT) AS q FROM events)
        |GROUP BY 1, 2
        |""".stripMargin,

    "o16_mode" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, user_id, n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY n DESC, user_id) AS rn
        |  FROM c
        |)
        |SELECT event_type, user_id AS mode, CAST(n AS BIGINT) AS n
        |FROM r WHERE rn = 1
        |""".stripMargin,

    "s_mutual_nn" ->
      "SELECT true AS mutual_ok, true AS precision_ok",

    "o15_pct_rank" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  percent_rank() OVER (
        |    PARTITION BY l_returnflag ORDER BY l_quantity) AS pr
        |FROM lineitem
        |""".stripMargin,

    "a42_histogram" ->
      """SELECT event_type,
        |  CAST(floor(value / 25.0) AS BIGINT) AS bin,
        |  CAST(floor(value / 25.0) AS BIGINT) * 25.0 AS bin_lo,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1, 2, 3
        |""".stripMargin,

    "o14_winsorize" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_quantity, 0.05) AS q_lo,
        |    quantile_cont(l_quantity, 0.95) AS q_hi
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  l.l_quantity, b.q_lo, b.q_hi,
        |  least(greatest(CAST(l.l_quantity AS DOUBLE), b.q_lo), b.q_hi)
        |    AS clipped
        |FROM lineitem l JOIN b USING (l_returnflag)
        |""".stripMargin,

    "a41_assortativity" ->
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
        |), e AS MATERIALIZED (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), dir AS (
        |  SELECT u AS a, v AS b FROM e
        |  UNION ALL SELECT v AS a, u AS b FROM e
        |), deg AS (
        |  SELECT a AS id, count(*) AS deg FROM dir GROUP BY 1
        |), p AS (
        |  SELECT dx.deg AS dx, dy.deg AS dy
        |  FROM dir JOIN deg dx ON dx.id = dir.a
        |  JOIN deg dy ON dy.id = dir.b
        |)
        |SELECT CAST(count(*) AS BIGINT) AS m_pairs,
        |  CAST(sum(dx) AS BIGINT) AS s_x,
        |  CAST(sum(dx * dy) AS BIGINT) AS s_xy,
        |  CAST(sum(dx * dx) AS BIGINT) AS s_xx,
        |  CAST(count(*) * sum(dx * dy) - sum(dx) * sum(dx) AS DOUBLE) /
        |    nullif(CAST(count(*) * sum(dx * dx) - sum(dx) * sum(dx)
        |      AS DOUBLE), 0.0) AS r
        |FROM p
        |""".stripMargin,

    "mm_wav_energy" ->
      """WITH spec AS (
        |  SELECT doc_id, CAST(1 + doc_id % 2 AS INT) AS n_channels,
        |    16 + doc_id % 9 AS frames
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, n_channels,
        |    CAST(unnest(range(frames * n_channels)) AS BIGINT) AS i
        |  FROM spec
        |), sm AS (
        |  SELECT doc_id,
        |    CAST((i // n_channels) // 8 AS INT) AS win,
        |    i // n_channels AS frame,
        |    ((doc_id * 131 + (i // n_channels) * 17 + (i % n_channels)
        |      * 71) % 65536) - 32768 AS s
        |  FROM px
        |)
        |SELECT doc_id, win,
        |  CAST(count(DISTINCT frame) AS INT) AS n_frames,
        |  CAST(max(abs(s)) AS BIGINT) AS peak,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
        |  CAST(sum(s * s) AS BIGINT) AS sum_sq
        |FROM sm GROUP BY 1, 2
        |""".stripMargin,

    "s_pca_invariants" ->
      ("SELECT true AS ortho_ok, true AS eig_sorted_ok, " +
        "true AS trace_ok, true AS whiten_ok"),

    "a40_ktruss" -> {
      def peel(r: Int): String = {
        val p = r - 1
        s"""t$r AS (SELECT a.u AS x, a.v AS y, b.v AS z
           |  FROM e$p a JOIN e$p b ON b.u = a.v
           |  JOIN e$p c ON c.u = a.u AND c.v = b.v),
           |s$r AS (SELECT u, v, count(*) AS c FROM (
           |  SELECT x AS u, y AS v FROM t$r
           |  UNION ALL SELECT x, z FROM t$r
           |  UNION ALL SELECT y, z FROM t$r) GROUP BY 1, 2),
           |e$r AS (SELECT e.u, e.v FROM e$p e
           |  JOIN s$r s ON s.u = e.u AND s.v = e.v WHERE s.c >= 2)"""
          .stripMargin
      }
      s"""WITH p AS (
         |  SELECT p_partkey AS pk, p_partkey % 16 AS m,
         |    p_partkey // 16 AS g
         |  FROM part
         |), e0 AS MATERIALIZED (
         |  SELECT a.pk AS u, b.pk AS v
         |  FROM p a JOIN p b ON a.g = b.g AND a.m < b.m
         |  WHERE b.m <= 4 OR (a.m >= 5 AND b.m <= 8
         |    AND NOT (a.m = 7 AND b.m = 8))
         |),
         |${peel(1)},
         |${peel(2)},
         |${peel(3)}
         |SELECT CAST(u AS BIGINT) AS a, CAST(v AS BIGINT) AS b FROM e3
         |""".stripMargin
    },

    "a43_trussness" -> {
      // one 3-round peel chain per k from the shared base; CTE names
      // carry the k so the chains stay independent
      def peelK(kk: Int): String = (1 to 3).map { r =>
        val prev = if (r == 1) "e0" else s"k${kk}e${r - 1}"
        s"""k${kk}t$r AS (SELECT a.u AS x, a.v AS y, b.v AS z
           |  FROM $prev a JOIN $prev b ON b.u = a.v
           |  JOIN $prev c ON c.u = a.u AND c.v = b.v),
           |k${kk}s$r AS (SELECT u, v, count(*) AS c FROM (
           |  SELECT x AS u, y AS v FROM k${kk}t$r
           |  UNION ALL SELECT x, z FROM k${kk}t$r
           |  UNION ALL SELECT y, z FROM k${kk}t$r) GROUP BY 1, 2),
           |k${kk}e$r AS MATERIALIZED (SELECT e.u, e.v FROM $prev e
           |  JOIN k${kk}s$r s ON s.u = e.u AND s.v = e.v
           |  WHERE s.c >= ${kk - 2})""".stripMargin
      }.mkString(",\n")
      s"""WITH p AS (
         |  SELECT p_partkey AS pk, p_partkey % 16 AS m,
         |    p_partkey // 16 AS g
         |  FROM part
         |), e0 AS MATERIALIZED (
         |  SELECT a.pk AS u, b.pk AS v
         |  FROM p a JOIN p b ON a.g = b.g AND a.m < b.m
         |  WHERE b.m <= 4 OR (a.m >= 5 AND b.m <= 8
         |    AND NOT (a.m = 7 AND b.m = 8))
         |    OR (a.m = 9 AND b.m = 10)
         |),
         |${peelK(3)},
         |${peelK(4)},
         |${peelK(5)}
         |SELECT CAST(e0.u AS BIGINT) AS a, CAST(e0.v AS BIGINT) AS b,
         |  CASE
         |    WHEN EXISTS (SELECT 1 FROM k5e3 t
         |      WHERE t.u = e0.u AND t.v = e0.v) THEN 5
         |    WHEN EXISTS (SELECT 1 FROM k4e3 t
         |      WHERE t.u = e0.u AND t.v = e0.v) THEN 4
         |    WHEN EXISTS (SELECT 1 FROM k3e3 t
         |      WHERE t.u = e0.u AND t.v = e0.v) THEN 3
         |    ELSE 2
         |  END AS trussness
         |FROM e0
         |""".stripMargin
    },

    "o13_weighted_sample" ->
      """WITH dr AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
        |    (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':priority'),
        |      1, 8))::BIGINT % 1000000) + 1 AS draw
        |  FROM documents
        |)
        |SELECT doc_id, w, CAST(draw AS BIGINT) AS draw
        |FROM dr
        |ORDER BY w * 1000000.0 / draw DESC, doc_id
        |LIMIT 25
        |""".stripMargin,

    "a39_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events
        |)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(count(*)) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS from_total
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY 1, 2
        |""".stripMargin,

    "w_anomaly_zscore" -> anomalySql(""),

    "w_stream_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events WHERE event_id % 20 = 0
        |)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(count(*)) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS from_total
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY 1, 2
        |""".stripMargin,

    "w_stream_anomaly" -> anomalySql(" WHERE event_id % 20 = 0"))
}
