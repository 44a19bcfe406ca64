package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-7 harness registrations — the remaining ungated production paths
  * plus the SimHash pair-generation operator that completes the dedup
  * family:
  *
  *  - `w_file_stream`: the FILE-BASED streaming source
  *    ([[graft.streaming.EventStreams.readStream]]) — the production entry
  *    point of the streaming layer, previously exercised by no gate (every
  *    other stream gate feeds a MemoryStream). Drives the real events
  *    parquet through the watermarked window aggregation; oracle = the
  *    batch SQL, so the `ts div 1000` microsecond conversion and schema
  *    are now driver-checked.
  *  - `d_simhash_pairs`: Hamming-band candidate generation over SimHash
  *    fingerprints ([[graft.ops.Dedup.simHashPairs]]) with a DETERMINISTIC
  *    completeness gate: by the pigeonhole band guarantee every planted
  *    pair within the Hamming radius MUST be recovered — checked exactly,
  *    not statistically.
  *  - `mm_decode_rejects`: the corrupt-blob side output of the PPM codec
  *    ([[graft.ops.Multimodal.decodePpmRejects]]) over deliberately
  *    corrupted blobs with oracle-predictable stable reason codes.
  *  - `s_ivf_staleness`: the index-drift metric
  *    ([[graft.ops.IvfIndex.AppendStats.staleness]]) must be monotone in
  *    distribution drift: appending shifted vectors scores strictly staler
  *    than appending in-distribution vectors.
  *
  * Plus the training-shard staging layer ([[graft.ops.TrainingPrep]]),
  * every face value-exact against the DuckDB oracle:
  *  - `d_hash_split`: deterministic md5-hash train/val/test assignment;
  *  - `t_lm_score`: CCNet-style unigram LM quality score with a capped
  *    broadcast vocabulary and OOV floor;
  *  - `t_pack`: per-shard greedy contiguous sequence packing into
  *    fixed-token-budget bins.
  */
object Round7Queries {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables.load(s, dir, name)

  private def sfTag(d: String): String = new java.io.File(d).getName

  private def rmrf(s: SparkSession, path: String): Unit = {
    val hp = new HPath(path)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) { fs.delete(hp, true); () }
  }

  /** (staleness of a same-distribution append, staleness of a shifted
    * append) — memoized per (session, sf dir): two index builds per run.
    * WEAK keys: a process-lifetime strong map keyed by SparkSession would
    * pin every session (and its SessionState) ever seen by the registry —
    * a slow leak in any long-lived multi-session JVM (test suites,
    * repeated harness runs). */
  private val stalenessMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (Double, Double)]]())

  /** Co-supply edge list for the graph gates, memoized per
    * (SparkContext, sf dir) as a temp-parquet spill — the same posture as
    * the events feed: the lineitem self-join that CONSTRUCTS the
    * dimension-sized graph (~49k edges at sf0.1) costs ~2 s per
    * evaluation, and re-deriving it per bench run measures the corpus
    * scan, not the graph operator. Parquet, not a driver-held local
    * relation: a LocalTableScan re-ships the rows with every task while a
    * 49k-row file scan is milliseconds and plans like any other source.
    * The operator under test still runs in full every invocation. */
  private val coSupplyMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext,
      java.util.concurrent.ConcurrentHashMap[String, String]]())

  private def coSupplyEdges(s: SparkSession, d: String): DataFrame = {
    val perDir = coSupplyMemo.synchronized {
      var m = coSupplyMemo.get(s.sparkContext)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, String]()
        coSupplyMemo.put(s.sparkContext, m)
      }
      m
    }
    val path = perDir.computeIfAbsent(d, _ => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      val a = li.select(col("ok"), col("sk").as("s1"))
      val b = li.select(col("ok"), col("sk").as("s2"))
      val out = s"/tmp/graft_cosupply_${sfTag(d).replace(".", "_")}"
      a.join(b, Seq("ok"))
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 5)
        .select(col("s1").as("src"), col("s2").as("dst"))
        .coalesce(4)
        .write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }

  val queries: Map[String, Q] = Map[String, Q](

    // --- File-based stream source gate --------------------------------------
    // The production streaming entry point: real parquet files, not a
    // MemoryStream. One micro-batch ingests every existing file; the
    // complete-mode window table must equal the batch aggregation over the
    // same data (w_tumbling_hour's shape, full corpus).
    "w_file_stream" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        val tag = sfTag(d).replace(".", "_")
        val out = graft.streaming.EventStreams.windowedCounts(
          graft.streaming.EventStreams.readStream(ss, d))
        val sink = s"w_file_stream_$tag"
        ss.catalog.dropTempView(sink)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        ss.table(sink).select(
          date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
      }),

    // --- Stream-stream interval join ----------------------------------------
    // The §2.10 face no other gate covers: a JOIN between two streams.
    // Clicks and errors (disjoint event subsets) feed two MemoryStreams in
    // two batches each; every (click, same-user error within the trailing
    // day) pair must appear exactly once. Inner joins emit matches as
    // they arrive, so the append sink after processAllAvailable holds the
    // complete pair set. Oracle = the identical range-bounded equi-join in
    // DuckDB over unix-micros longs (Spark's INTERVAL arithmetic on
    // µs-truncated timestamps IS µs-integer arithmetic, so the boundary
    // predicates agree exactly).
    "w_stream_join" -> ((s, d) =>
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
          lookbackMinutes = 24 * 60)
        val sink = s"w_stream_join_$tag"
        ss.catalog.dropTempView(sink)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          val clicks = feed("click"); val errors = feed("error")
          val (l1, l2) = clicks.splitAt(clicks.length / 2)
          val (r1, r2) = errors.splitAt(errors.length / 2)
          memL.addData(l1: _*); memR.addData(r1: _*)
          q.processAllAvailable()
          memL.addData(l2: _*); memR.addData(r2: _*)
          q.processAllAvailable()
        } finally q.stop()
        ss.table(sink).select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("r_event_id"),
          unix_micros(col("r_ts")).as("r_ts_us"))
      }),

    // --- SimHash Hamming-band pairs: deterministic completeness gate --------
    // Corpus = documents + exact-duplicate twins (Hamming 0 by
    // construction) + one-token-appended twins (small but varying
    // Hamming). Soundness: every emitted pair is within the radius
    // (re-verified here from scratch fingerprints). Completeness: every
    // planted twin pair that IS within the radius must be emitted — the
    // band pigeonhole makes this exact, so the gate is a hard boolean,
    // not a recall estimate. Non-vacuity: the exact twins guarantee at
    // least |documents| planted in-radius pairs.
    "d_simhash_pairs" -> ((s, d) => {
      import graft.ops.{Dedup, TextAnalysis}
      val maxHamming = 3
      val docs = t(s, d, "documents").select("doc_id", "text")
      val corpus = docs
        .unionByName(docs.select((col("doc_id") + 2000000).as("doc_id"),
          col("text")))
        .unionByName(docs.select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" graftmarker")).as("text")))
      val got = Dedup.simHashPairs(corpus, n = 3, maxHamming = maxHamming)
      val fp = docs.select(col("doc_id"),
        Dedup.simHash(TextAnalysis.wordShingleHashes(col("text"), 3)).as("fp"))
      val fpTwin = corpus.filter(col("doc_id") >= 1000000)
        .select(col("doc_id"),
          Dedup.simHash(TextAnalysis.wordShingleHashes(col("text"), 3)).as("fp"))
      val planted = fp.alias("a")
        .join(fpTwin.alias("b"),
          col("b.doc_id") % 1000000 === col("a.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("ham"))
        .filter(col("ham") <= maxHamming)
      val missing = planted.join(got, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("n_missing"))
      val nPlanted = planted.agg(count(lit(1)).as("n_planted"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      // soundness is INDEPENDENTLY recomputed: fingerprint the corpus
      // from scratch and re-derive every emitted pair's Hamming distance
      // — taking max(got.hamming) would test the operator against its
      // own filter (hamming <= radius by construction) and catch nothing
      val fpAll = corpus.select(col("doc_id"),
        Dedup.simHash(TextAnalysis.wordShingleHashes(col("text"), 3))
          .as("fp"))
      val sound = got
        .join(fpAll.select(col("doc_id").as("id_a"), col("fp").as("fa")),
          "id_a")
        .join(fpAll.select(col("doc_id").as("id_b"), col("fp").as("fb")),
          "id_b")
        .agg(coalesce(max(bit_count(col("fa").bitwiseXOR(col("fb")))),
          lit(0)).as("max_ham"),
          coalesce(min(bit_count(col("fa").bitwiseXOR(col("fb")))
            === col("hamming")), lit(true)).as("ham_reported_ok"))
      missing.crossJoin(nPlanted).crossJoin(nDocs).crossJoin(sound).select(
        (col("n_missing") === 0).as("planted_all_recovered"),
        (col("n_planted") >= col("n_docs")).as("planted_nonvacuous"),
        (col("max_ham") <= maxHamming && col("ham_reported_ok"))
          .as("pairs_within_radius"))
    }),

    // --- PPM corrupt-blob side output ---------------------------------------
    // Every 7th blob gets its magic overwritten, every 7th+1 loses its
    // raster tail; the reject stream must carry exactly those doc_ids with
    // the stable reason codes the oracle predicts, and no clean row may
    // leak into it.
    "mm_decode_rejects" -> ((s, d) => {
      import graft.ops.Multimodal
      val blobs = Multimodal.ppmEncode(t(s, d, "documents"))
      val corrupted = blobs.withColumn("content",
        when(col("doc_id") % 7 === 0,
          concat(lit("X".getBytes("US-ASCII")),
            col("content").substr(lit(2), length(col("content")))))
          .when(col("doc_id") % 7 === 1,
            col("content").substr(lit(1), length(col("content")) - 10))
          .otherwise(col("content")))
      Multimodal.decodePpmRejects(corrupted)
    }),

    // --- Real PPM downscale, verified through the real decoder --------------
    // resize -> decode composition over real P6 bytes: nearest-neighbor
    // 2x subsampling keeps pixels at even (row, col), so the oracle can
    // recompute the resized image's per-channel sums arithmetically from
    // the pixel formula — a header re-encode or stride bug breaks the
    // hash.
    "mm_resize_ppm" -> ((s, d) =>
      graft.ops.Multimodal.decodePpm(
        graft.ops.Multimodal.resizePpm(
          graft.ops.Multimodal.ppmEncode(t(s, d, "documents")), factor = 2))),

    // --- Deterministic train/val/test split (value-exact oracle) ------------
    // Leakage-free reproducible assignment by id hash — md5 hex is
    // byte-identical across engines, so the oracle recomputes every
    // label exactly.
    "d_hash_split" -> ((s, d) =>
      graft.ops.TrainingPrep.hashSplit(t(s, d, "documents"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")),

    // --- Deterministic domain-mixing resampler (value-exact oracle) ---------
    // src0 upsampled 2.5x, src1 downsampled to 0.5x, src2 dropped, the
    // rest kept at 1x — every copy count is a pure function of
    // (source weight, md5(doc_id)), so the oracle reproduces the exact
    // multiset.
    "d_mix_resample" -> ((s, d) =>
      graft.ops.TrainingPrep.resampleBySource(t(s, d, "documents"),
        Map("src0" -> 2.5, "src1" -> 0.5, "src2" -> 0.0))),

    // --- Unigram LM quality score (value-exact oracle) ----------------------
    // CCNet-style reference-model scoring, self-referenced here; the
    // vocabulary cap is set well below the corpus vocabulary so the OOV
    // floor path is exercised on real rows.
    "t_lm_score" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.ops.TrainingPrep.lmScore(docs, docs, vocabSize = 500)
    }),

    // --- Sequence packing (value-exact oracle) -------------------------------
    // Per-shard greedy contiguous packing into 512-token bins via
    // windowed prefix sums — partitioned by shard, never a global
    // single-partition window.
    "t_pack" -> ((s, d) =>
      graft.ops.TrainingPrep.packSequences(t(s, d, "documents"),
        budgetTokens = 512, shards = 8)),

    // --- Sliding-window chunking (value-exact oracle) ------------------------
    // 40-token windows advancing by 30 (10-token overlap): chunk count,
    // boundaries and the reassembled chunk text are all exact functions
    // of the whitespace token array, recomputed verbatim by the oracle.
    "t_chunk" -> ((s, d) =>
      graft.ops.TextAnalysis.chunk(t(s, d, "documents"),
        chunkTokens = 40, overlap = 10)),

    // --- Corpus-wide line-level dedup (value-exact oracle) -------------------
    // No document in the synthetic corpus contains a newline, so the gate
    // CONSTRUCTS line-dedup pressure deterministically: doc g of the
    // derived corpus has 4 lines = the texts of source docs g..g+3, so
    // every text appears as a line in up to 4 derived docs and only its
    // first (id, ix) occurrence may survive. The oracle replicates the
    // construction and the first-occurrence rule exactly.
    "d_line_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val bounds = docs.agg(min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
      val lines = docs
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), lit(3L))).as("off"))
        .select((col("doc_id") - col("off")).as("gid"),
          col("off").as("ix"), col("text").as("line"))
        .crossJoin(broadcast(bounds))
        .filter(col("gid") >= col("lo") && col("gid") <= col("hi") - 3)
      val multi = lines.groupBy("gid")
        .agg(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("ix"), col("line")))),
          x => x.getField("line"))).as("text"))
        .select(col("gid").as("doc_id"), col("text"))
      graft.ops.Dedup.dedupLines(multi)
    }),

    // --- Per-source document cap (value-exact oracle) ------------------------
    // Domain-cap curation: best 20 docs per source by (n_chars desc,
    // doc_id asc) through the bounded-heap top-k aggregate — map-side
    // capped partials, no per-source window funnel.
    "d_source_cap" -> ((s, d) =>
      graft.ops.TrainingPrep.capPerSource(t(s, d, "documents"),
        k = 20, score = col("n_chars"))),

    // --- Radius similarity search (value-exact oracle) -----------------------
    // Everything with cosine >= 0.25 of each probe vector (p99 of the
    // synthetic pair distribution is ~0.29, so the band is selective but
    // populated); exact cosine on both engines, rounded 6dp.
    "s_radius_search" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queriesDf = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.ops.Similarity.radiusSearch(emb, queriesDf, threshold = 0.25)
        .withColumn("cosine", round(col("cosine"), 6))
    }),

    // --- IVF-probed radius search, exact mode (value-exact oracle) -----------
    // nProbe == nList: every cell probed, so the probed plan must equal
    // brute-force radius search exactly — same oracle SQL. Recall at
    // nProbe < nList is the standard IVF tradeoff (gated for top-k by
    // s_ivf_refined_recall).
    "s_ivf_radius" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queriesDf = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.ops.Similarity.ivfRadiusSearch(emb, queriesDf,
        threshold = 0.25, nList = 8, nProbe = 8)
        .withColumn("cosine", round(col("cosine"), 6))
    }),

    // --- Deterministic pre-training shuffle (value-exact oracle) -------------
    // Shard and in-shard position are pure functions of (doc_id, seed)
    // through the md5 draw, so the oracle reproduces the full permutation
    // byte-exactly.
    "d_shuffle_shards" -> ((s, d) =>
      graft.ops.TrainingPrep.shuffleShards(t(s, d, "documents"),
        shards = 8)),

    // --- Quantile-band filter (invariant gate) -------------------------------
    // Keep the middle [0.25, 0.75] of the n_chars distribution through
    // the sketch-threshold path; the gate bounds the sketch against the
    // EXACT percentiles: thresholds must land inside the exact [p24,p26]
    // / [p74,p76] rank neighborhoods (the rank-error contract with two
    // orders of magnitude of slack) and the surviving fraction must be
    // ~half the corpus.
    "t_quality_band" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val band = graft.ops.TrainingPrep.quantileBand(docs, col("n_chars"),
        lo = 0.25, hi = 0.75)
      // ONE combined action for every check input (band stats crossJoined
      // with corpus stats + exact percentiles) on top of the operator's
      // own single threshold pass
      val row = band
        .agg(count(lit(1)).cast("double").as("kept"),
          min(col("n_chars").cast("double")).as("band_lo"),
          max(col("n_chars").cast("double")).as("band_hi"))
        .crossJoin(docs.agg(count(lit(1)).cast("double").as("total"),
          expr("percentile(n_chars, array(0.24, 0.26, 0.74, 0.76))")
            .as("p")))
        .collect().head
      val ex = row.getSeq[Double](4)
      val frac = row.getDouble(0) / row.getDouble(3)
      import s.implicits._
      Seq((
        row.getDouble(1) >= ex(0) && row.getDouble(1) <= ex(1),
        row.getDouble(2) >= ex(2) && row.getDouble(2) <= ex(3),
        frac >= 0.45 && frac <= 0.56
      )).toDF("lo_within_exact_neighborhood", "hi_within_exact_neighborhood",
        "kept_fraction_near_half")
    }),

    // --- Vocabulary builder (value-exact oracle) -----------------------------
    // Top-100 words with probability and cumulative coverage under the
    // lm_score normalization; counts are integers and both engines round
    // the same divisions to 6dp, so the whole curve is value-exact.
    "t_vocab" -> ((s, d) =>
      graft.ops.TrainingPrep.vocabulary(t(s, d, "documents"), topV = 100)),

    // --- BM25 full-text ranking (value-exact oracle) -------------------------
    // Every formula input (tf, df, dl, N, avgdl) is integer-derived, so
    // the 4-dp score is engine-independent — the oracle recomputes the
    // whole Okapi pipeline in SQL.
    "t_bm25" -> ((s, d) =>
      graft.ops.TextSearch.bm25(t(s, d, "documents"),
        Seq("spark", "vector", "stream"))),

    // --- BPE tokenizer training ----------------------------------------------
    // Trains a 40-merge BPE table on the documents corpus and checks the
    // contracts that make a tokenizer usable, as hard booleans:
    // round-trip losslessness over EVERY distinct corpus word (checked
    // distributed), compression (the merged segmentation has strictly
    // fewer tokens than the char baseline), partitioning-independence of
    // the learned table (same merges from a 7-partition re-shuffle), and
    // the exact merge count. The per-merge EXACTNESS of the algorithm is
    // pinned by BpeSpec against the ACL'16 reference example.
    "t_bpe_train" -> ((s, d) => {
      import s.implicits._
      import graft.ops.{Bpe, TextAnalysis}
      val docs = t(s, d, "documents")
      val merges = Bpe.train(docs, numMerges = 40)
      val ranks = merges.zipWithIndex.toMap
      val sums = Bpe.tokenCounts(docs, merges)
        .agg(sum("n_bpe_tokens")).collect().head.getLong(0)
      val base = Bpe.tokenCounts(docs, Seq.empty)
        .agg(sum("n_bpe_tokens")).collect().head.getLong(0)
      val rt = udf((w: String) =>
        Bpe.decodeString(Bpe.segmentWord(w, ranks).mkString) == w + " ")
      val lossless = docs
        .select(explode(split(TextAnalysis.normalized(col("text")), " "))
          .as("word"))
        .filter(length(col("word")) > 0).distinct()
        .agg(min(rt(col("word")))).collect().head.getBoolean(0)
      val deterministic =
        Bpe.train(docs.repartition(7), numMerges = 40) == merges
      Seq((merges.length.toLong, sums < base, lossless, deterministic))
        .toDF("n_merges", "compresses", "roundtrip_lossless",
          "deterministic")
    }),

    // --- Hybrid retrieval: reciprocal-rank fusion ----------------------------
    // One query, two incommensurable rankers — BM25 over the document
    // text and exact cosine over the aligned embedding (doc_id ≡ vec_id
    // in the corpus) — fused rank-wise. Value-exact oracle: both ranked
    // CTE lists use the same (score desc, id) tie-break as the operator,
    // and 1/(60+rank) sums over ≤2 terms are order-free IEEE doubles.
    "s_rrf_fusion" -> ((s, d) => {
      import graft.ops.{Similarity, TextSearch}
      val emb = t(s, d, "embeddings")
      val qv = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("query_id"), col("embedding"))
      val dense = Similarity.bruteForceTopK(emb, qv, k = 50)
        .select(col("query_id"), col("id"), col("cosine").as("score"))
      val sparse = TextSearch.bm25(t(s, d, "documents"),
        Seq("spark", "vector", "stream"))
        .select(lit(0L).as("query_id"), col("doc_id").as("id"),
          col("bm25").as("score"))
      TextSearch.rrfFuse(Seq(sparse, dense))
    }),

    // --- Substring-level duplicate spans (value-exact oracle) ----------------
    // Corpus = documents + whole-document twins for the even half, so the
    // interval merge is exercised on full-document spans while natural
    // cross-document 5-gram repeats yield partial spans. The oracle
    // recomputes positions from string grams; the engine runs on 64-bit
    // gram hashes — identical output up to hash collisions.
    "d_dup_spans" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      graft.ops.Dedup.duplicateSpans(corpus, n = 5)
    }),

    // --- The CUT step over duplicate spans (value-exact oracle) --------------
    // Same twin-union corpus as d_dup_spans; the oracle removes the union
    // of per-gram cover intervals, which equals the union of the merged
    // spans (two grams merge exactly when their intervals overlap or
    // touch), so it never needs the window-merge — an independent
    // formulation of the same semantics.
    "d_cut_spans" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 2 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      graft.ops.Dedup.cutSpans(corpus, n = 5)
    }),

    // --- Sketch profile error contract ---------------------------------------
    // The one-pass HLL++/KLL profile must sit within its advertised error
    // of the exact answers on every key — checked per key, reported as
    // hard booleans.
    "a15_sketch_profile" -> ((s, d) => {
      val ev = t(s, d, "events")
      val approx = graft.ops.Profile.sketchProfile(
        ev, "event_type", "user_id", "value")
      // DISCRETE exact order statistics (sorted-element-at-rank), not the
      // interpolating percentile(): the sketch's contract is an ELEMENT
      // whose rank is within eps·n of the target, so comparing against
      // the interpolated midpoint adds a half-gap discretization error
      // that dwarfs the sketch error on small groups (p95 over a
      // ~200-row group sat 2.5% from the interpolated value while being
      // the rank-exact answer — the sf0.001 scale probe caught it).
      val exact = ev.groupBy("event_type").agg(
        countDistinct("user_id").as("nd_exact"),
        expr("element_at(array_sort(collect_list(value)), " +
          "cast(ceil(0.50 * count(value)) as int))").as("p50_exact"),
        expr("element_at(array_sort(collect_list(value)), " +
          "cast(ceil(0.95 * count(value)) as int))").as("p95_exact"))
      approx.join(exact, "event_type").agg(
        max(abs(col("n_distinct_approx") - col("nd_exact")) /
          col("nd_exact")).as("nd_err"),
        max(abs(col("p50_approx") - col("p50_exact")) /
          abs(col("p50_exact"))).as("p50_err"),
        max(abs(col("p95_approx") - col("p95_exact")) /
          abs(col("p95_exact"))).as("p95_err")
        // HLL++'s 5% rsd is ONE standard deviation, not a hard bound —
        // a key can legitimately land past 1 sigma, so the gate allows
        // 3x rsd (the sketch is deterministic per corpus, but the bound
        // must hold for ANY corpus the driver points this at). The
        // quantile sketch's accuracy=1e4 gives eps=1e-4 rank error;
        // 2% value slack is generous for any non-pathological values.
      ).select((col("nd_err") < 0.15).as("distinct_within_rsd"),
        (col("p50_err") < 0.02).as("p50_within_eps"),
        (col("p95_err") < 0.02).as("p95_within_eps"))
    }),

    // --- Salted two-phase aggregation (value-exact oracle) -------------------
    // The skew tools were unit-tested only; this registers them against
    // the exact answers: bucket-disjointness must make the salted
    // countDistinct sum and the flattened salted collect_set EQUAL their
    // single-phase forms, not approximate them.
    "a16_salted_agg" -> ((s, d) => {
      val ev = t(s, d, "events")
      val counts = graft.core.Skew.saltedCountDistinct(
        ev, Seq("event_type"), "user_id", "n_users")
      val sets = graft.core.Skew.saltedCollectSet(
        ev, Seq("event_type"), "user_id", "users")
      counts.join(sets, "event_type").select(col("event_type"),
        col("n_users"),
        concat_ws(",", transform(col("users"), _.cast("string")))
          .as("users"))
    }),

    // --- Stream face of bloom decontamination --------------------------------
    // bloomContaminatedFlag is a stateless per-row predicate, so the
    // decontaminating curation filter runs in Structured Streaming with
    // NO state store. The gate pins stream/batch equivalence: the
    // append-mode survivors must equal the identical batch plan's
    // survivors exactly (same bloom bytes ⇒ same false positives ⇒ a
    // set-level guarantee, not a statistical one).
    "w_stream_curate" -> ((s, d) =>
      Round6Queries.withShufflePartitions(s, 8) { ss =>
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import graft.ops.TextAnalysis
        val tag = sfTag(d).replace(".", "_")
        val docs = t(ss, d, "documents")
        val probes = docs.filter(col("doc_id") < 5)
        val bloom = TextAnalysis.shingleBloom(probes, n = 3,
          expectedItems = 20000L, numBits = 200000L)
        def curate(in: org.apache.spark.sql.DataFrame) = in
          .filter(TextAnalysis.tokenCount(col("text")) >= 10)
          .filter(!TextAnalysis.bloomContaminatedFlag(col("text"), bloom, 3))
          .select("doc_id")
        // 1-in-10 deterministic subset feeds the MemoryStream harness
        val feed = docs.filter(col("doc_id") >= 5 && col("doc_id") % 10 === 0)
          .select("doc_id", "text")
        val rows = feed.as[(Long, String)].collect().toSeq
        val mem = MemoryStream[(Long, String)]
        val sink = s"w_stream_curate_$tag"
        ss.catalog.dropTempView(sink)
        val q = curate(mem.toDS().toDF("doc_id", "text"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          val (h1, h2) = rows.splitAt(rows.length / 2)
          mem.addData(h1: _*)
          q.processAllAvailable()
          mem.addData(h2: _*)
          q.processAllAvailable()
        } finally q.stop()
        val stream = ss.table(sink)
        val batch = curate(feed)
        val symDiff = stream.unionByName(batch)
          .groupBy("doc_id").agg(count(lit(1)).as("c"))
          .filter(col("c") =!= 2)
          .agg(count(lit(1)).as("n_diff"))
        symDiff.crossJoin(stream.agg(count(lit(1)).as("n_stream"))).select(
          (col("n_diff") === 0).as("stream_equals_batch"),
          (col("n_stream") > 0).as("survivors_nonempty"))
      }),

    // --- Bloom-filter decontamination contract -------------------------------
    // The scale face of t_contamination: when the eval probe set is too
    // big to broadcast exactly, a fixed-size mergeable bloom replaces the
    // exact hash set. The gate pins BOTH halves of the bloom contract
    // against the exact broadcast semi-join on the same shingle-hash
    // substrate: (a) no false negatives — every exact hit is flagged,
    // per document, with at-least-equal multiplicity; (b) over-flagging
    // stays within 5x the ~1%-sized filter's nominal false-positive rate.
    "t_bloom_contamination" -> ((s, d) => {
      import graft.ops.TextAnalysis
      val docs = t(s, d, "documents")
      val probes = docs.filter(col("doc_id") < 5)
      val corpus = docs.filter(col("doc_id") >= 5)
      val bloom = TextAnalysis.shingleBloom(probes, n = 3,
        expectedItems = 20000L, numBits = 200000L)
      val flagged = TextAnalysis.bloomContaminated(corpus, bloom, n = 3)
      val ch = corpus.select(col("doc_id"),
        explode(TextAnalysis.wordShingleHashes(col("text"), 3)).as("h"))
      val ph = probes.select(
        explode(TextAnalysis.wordShingleHashes(col("text"), 3)).as("h"))
        .distinct()
      val exact = ch.join(broadcast(ph), Seq("h"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      val noFn = exact.join(flagged, Seq("doc_id"), "left")
        .agg(coalesce(min(coalesce(col("n_flagged") >= col("n_hit"),
          lit(false))), lit(true)).as("no_false_negatives"))
      val rate = exact.agg(sum("n_hit").as("e"))
        .crossJoin(flagged.agg(sum("n_flagged").as("b")))
        .crossJoin(ch.agg(count(lit(1)).as("n_tested")))
        .select(((col("b") - col("e")) /
          greatest(col("n_tested") - col("e"), lit(1L)) <= 0.05)
          .as("fp_rate_bounded"))
      noFn.crossJoin(rate)
    }),

    // --- Index staleness is monotone in drift --------------------------------
    // The index is built on a CLUSTERED corpus (8 tight Voronoi-friendly
    // clusters derived from anchor vectors — the regime an IVF index
    // serves; on an isotropic corpus mean-assign-cosine is ~0.2 for ANY
    // distribution, so no drift metric could move). Appending more
    // in-cluster members must read ≈ no drift; appending the RAW
    // isotropic vectors (off this index's manifold) must read decisively
    // stale — rebuild triggers hang off this separation.
    "s_ivf_staleness" -> ((s, d) => {
      import s.implicits._
      val (same, shifted) = stalenessMemo
        .computeIfAbsent(s, _ => new java.util.concurrent.ConcurrentHashMap())
        .computeIfAbsent(d, { _ =>
        val emb = t(s, d, "embeddings").select(col("vec_id"),
          graft.functions.Vectors.toDouble(col("embedding")).as("embedding"))
        val anchors = broadcast(emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("k"), col("embedding").as("anchor")))
        // cluster key from vec_id div 2: independent of the even/odd
        // build/append split below, so BOTH halves cover all 8 clusters
        // (a plain vec_id % 8 would send even ids to even clusters only —
        // the "in-distribution" append would then be genuine drift)
        val clustered = emb.filter(col("vec_id") >= 8)
          .withColumn("k", expr("(vec_id div 2) % 8"))
          .join(anchors, "k")
          .select(col("vec_id"),
            zip_with(col("anchor"), col("embedding"),
              (a, x) => a + lit(0.05) * x).as("embedding"))
        val base = clustered.filter(col("vec_id") % 2 === 0)
        val addIn = clustered.filter(col("vec_id") % 2 === 1)
        val addOff = emb.filter(col("vec_id") >= 8 && col("vec_id") % 2 === 1)
        val tag = sfTag(d).replace(".", "_")
        def stalenessOf(suffix: String, rows: DataFrame): Double = {
          val path = s"/tmp/graft_staleness_${tag}_$suffix"
          rmrf(s, path)
          graft.ops.IvfIndex.build(base, path, nList = 8)
          graft.ops.IvfIndex.append(s, path, rows).staleness
        }
        (stalenessOf("same", addIn), stalenessOf("off", addOff))
      })
      Seq((same, shifted)).toDF("st_same", "st_off").select(
        (col("st_off") > col("st_same") + 0.3).as("drift_separates"),
        (abs(col("st_same")) < 0.05).as("in_dist_near_zero"))
    }),

    // --- Point-in-time (as-of) join ------------------------------------------
    // "Last error state as of each click, per user, within an hour" — the
    // classic feature-enrichment shape. Value-exact vs DuckDB's native
    // ASOF LEFT JOIN. Timestamps compare as unix-micros LONGS on both
    // sides (the parquet ns → µs truncation is integer-identical in the
    // two engines; comparing raw timestamps would re-admit the ns-vs-µs
    // boundary ambiguity). The right side pre-aggregates to one row per
    // (user, µs) because the tie WINNER is engine-defined even though
    // both engines pick from the same tied set.
    "j10_asof_join" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
      val tsUs = unix_micros(col("ts").cast("timestamp"))
      val l = ev.filter(col("event_type") === "click")
        .select(col("user_id"), tsUs.as("ts_us"), col("event_id"),
          col("value"))
      val r = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), tsUs.as("rts"))
        .agg(max("value").as("err_value"))
      graft.ops.Temporal.asOfJoin(l, r, Seq("user_id"),
        leftTs = "ts_us", rightTs = "rts",
        tolerance = Some(3600000000L))
    }),

    // --- Interval-overlap (range) join ---------------------------------------
    // 30-minute click windows × 30-minute error windows per user; a pair
    // appears iff the windows overlap (⇔ |Δts| ≤ 30 min). The operator
    // buckets onto the window-width grid and equi-joins — the oracle is
    // the raw inequality join, which DuckDB can afford at test scale and
    // Spark could not at cluster scale (BroadcastNestedLoop).
    "j11_range_join" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
      val tsUs = unix_micros(col("ts").cast("timestamp"))
      val win = 1800000000L
      def side(kind: String) = ev.filter(col("event_type") === kind)
        .select(col("user_id"), col("event_id"), tsUs.as("s_us"),
          (tsUs + win).as("e_us"))
      graft.ops.Temporal.rangeJoin(side("click"), side("error"),
        Seq("user_id"), "s_us", "e_us", "s_us", "e_us",
        bucketWidth = win)
    }),

    // --- Blocked edit-distance (fuzzy) self-join -----------------------------
    // Entity resolution over 24-char document prefixes: originals plus a
    // deterministically perturbed twin each (one char deleted at an
    // id-dependent position — the same arithmetic in both engines). The
    // operator blocks by PassJoin partition signatures and verifies only
    // co-bucketed pairs; the oracle is the brute cross product + DuckDB
    // levenshtein, so completeness of the blocking is value-exact: every
    // pair the cross product finds, the blocked join must find.
    "j12_fuzzy_join" -> ((s, d) => {
      val base = t(s, d, "documents").select(
        col("doc_id").cast("long").as("id"),
        substring(col("text"), 1, 24).as("s"))
      val pfx = (col("id") % 12 + 2).cast("int")
      val pert = base.select((col("id") + 1000000L).as("id"),
        concat(col("s").substr(lit(1), pfx),
          col("s").substr(pfx + 2, lit(100))).as("s"))
      graft.ops.FuzzyJoin.fuzzyPairs(base.unionByName(pert), "id", "s",
        maxDist = 2)
    }),

    // --- PageRank over the supplier→nation→region hierarchy -----------------
    // 8 damped power-iteration steps, value-exact vs an UNROLLED DuckDB
    // oracle (one CTE triple per iteration — contribution aggregate,
    // dangling-mass scalar, rank update). Regions have no out-edges, so
    // the dangling-redistribution path is live, and every arithmetic
    // step ((1 - 0.85)/n, 0.85·(c + m/n)) is the same IEEE double
    // expression in both engines; only summation order differs, which
    // the comparator's 1e-9 relative tolerance absorbs.
    // Scoped to 8 shuffle partitions: the supplier→nation→region graph is
    // dimension-sized by construction (|suppliers| + 30 nodes), and the
    // power loop pays 2 shuffles per iteration — 32-partition exchanges
    // over a 10k-row rank vector are pure per-task overhead × 16 jobsteps.
    // AQE is scoped OFF for the same reason: adaptive execution runs each
    // shuffle stage as its own job to re-plan on runtime stats, which an
    // 8-iteration loop over a dimension-sized graph turns into pure job-
    // submission overhead — measured 89 jobs / ~3.3 s with AQE vs
    // 26 jobs / ~2.5 s without, identical results (there is nothing to
    // re-plan: partition count is pinned and every join side is tiny).
    // (A production web-graph run sizes partitions to the corpus and
    // leaves AQE on; this is the same contract as the stream gates'
    // state-store scoping.)
    "a17_pagerank" -> ((s, d) => Round6Queries.withScopedConf(s,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "false") { ss =>
      val sup = t(ss, d, "supplier").select(
        concat(lit("s:"), col("s_suppkey")).as("src"),
        concat(lit("n:"), col("s_nationkey")).as("dst"))
      val nat = t(ss, d, "nation").select(
        concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst"))
      graft.bel.PageRank.run(sup.unionByName(nat), iterations = 8)
    }),

    // --- Triangle counts / clustering over the co-supply graph --------------
    // Graph construction is itself the operator under test: suppliers are
    // linked when their co-occurring lineitem pairs over shared orders
    // number >= 5 (count(*) over the self-join, so an order with several
    // lineitems per supplier contributes lines1*lines2 — the min-support
    // threshold; without it the co-occurrence graph is near-complete at
    // sf0.1 and triangle counting is vacuous). [[graft.bel.Triangles]] counts
    // per-node triangles via degree-ordered orientation; the oracle is the
    // plain wedge self-join, exact on every (node, deg, triangles, lcc).
    "a18_triangles" -> ((s, d) => {
      graft.bel.Triangles.localTriangles(coSupplyEdges(s, d))
        .select(col("node").cast("long").as("node"), col("deg"),
          col("triangles"), col("lcc"))
    }))

  /** The [[graft.bel.PageRank]] recurrence unrolled to chained CTEs —
    * DuckDB has no iterative aggregation, so the oracle IS the fixed
    * iteration count, one (contribution, dangling, update) triple per
    * step. */
  private def pagerankOracle(iters: Int): String = {
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
         |    (1 - 0.85) / nn.n + 0.85 * (coalesce(c.c, 0) + d$i.m / nn.n)
         |      AS rank
         |  FROM vertices v CROSS JOIN nn CROSS JOIN d$i
         |  LEFT JOIN c$i c ON c.node = v.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT 's:' || s_suppkey AS src, 'n:' || s_nationkey AS dst
       |    FROM supplier
       |    UNION ALL
       |    SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation)
       |), vertices AS (
       |  SELECT DISTINCT node FROM (
       |    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
       |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM vertices),
       |outdeg AS (
       |  SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
       |), r0 AS (
       |  SELECT node, 1.0 / nn.n AS rank FROM vertices CROSS JOIN nn
       |),
       |$steps
       |SELECT node, rank FROM r$iters
       |""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "a17_pagerank" -> pagerankOracle(8),

    "a18_triangles" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
        |und AS (
        |  SELECT a.sk AS a, b.sk AS b
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.sk < b.sk
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |),
        |adj AS (SELECT a AS n, b AS m FROM und
        |        UNION ALL SELECT b AS n, a AS m FROM und),
        |deg AS (SELECT n, count(*) AS deg FROM adj GROUP BY n),
        |tri AS (
        |  SELECT w1.n AS n, count(*) AS t
        |  FROM adj w1 JOIN adj w2 ON w1.n = w2.n AND w1.m < w2.m
        |  JOIN und e ON e.a = w1.m AND e.b = w2.m
        |  GROUP BY 1
        |)
        |SELECT CAST(d.n AS BIGINT) AS node, d.deg AS deg,
        |  CAST(coalesce(t.t, 0) AS BIGINT) AS triangles,
        |  CASE WHEN d.deg >= 2
        |    THEN CAST(2 * coalesce(t.t, 0) AS DOUBLE)
        |         / CAST(d.deg * (d.deg - 1) AS DOUBLE)
        |    ELSE 0.0 END AS lcc
        |FROM deg d LEFT JOIN tri t ON t.n = d.n
        |""".stripMargin,

    "j12_fuzzy_join" ->
      """WITH base AS (
        |  SELECT CAST(doc_id AS BIGINT) AS id, substr(text, 1, 24) AS s
        |  FROM documents
        |), pert AS (
        |  SELECT b.id + 1000000 AS id,
        |    substr(b.s, 1, CAST(b.id % 12 + 2 AS INT)) ||
        |      substr(b.s, CAST(b.id % 12 + 4 AS INT)) AS s
        |  FROM base b
        |), u AS (SELECT * FROM base UNION ALL SELECT * FROM pert)
        |SELECT a.id AS a_id, b.id AS b_id,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM u a JOIN u b
        |  ON (len(a.s) < len(b.s) OR (len(a.s) = len(b.s) AND a.id < b.id))
        |WHERE levenshtein(a.s, b.s) <= 2
        |""".stripMargin,

    "j11_range_join" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s_us,
        |    epoch_us(ts) + 1800000000 AS e_us
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, event_id AS r_event_id, epoch_us(ts) AS r_s_us,
        |    epoch_us(ts) + 1800000000 AS r_e_us
        |  FROM events WHERE event_type = 'error'
        |)
        |SELECT l.user_id, l.event_id, l.s_us, l.e_us,
        |  r.r_event_id, r.r_s_us, r.r_e_us
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND l.s_us <= r.r_e_us AND r.r_s_us <= l.e_us
        |""".stripMargin,

    "t_bpe_train" ->
      ("SELECT CAST(40 AS BIGINT) AS n_merges, true AS compresses, " +
        "true AS roundtrip_lossless, true AS deterministic"),

    "s_rrf_fusion" ->
      """WITH norm AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |    AS t
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, t, len(string_split(t, ' ')) AS dl FROM norm
        |), stats AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |  FROM d
        |), ex AS (
        |  SELECT doc_id, dl, unnest(string_split(t, ' ')) AS word FROM d
        |), tf AS (
        |  SELECT doc_id, dl, word, count(*) AS tf FROM ex
        |  WHERE word IN ('spark', 'vector', 'stream') GROUP BY 1, 2, 3
        |), idf AS (
        |  SELECT word, ln(1 + (n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
        |  FROM tf, stats GROUP BY word, n
        |), bm AS (
        |  SELECT doc_id AS id, round(sum(idf * tf * 2.2 /
        |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        |  FROM tf JOIN idf USING (word), stats GROUP BY doc_id
        |), bmr AS (
        |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank
        |  FROM bm
        |), q AS (
        |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
        |), scored AS (
        |  SELECT e.vec_id AS id,
        |    list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |      CAST(e.embedding AS DOUBLE[])) AS c
        |  FROM q, embeddings e WHERE e.vec_id <> 0
        |), dr AS (
        |  SELECT id, row_number() OVER (ORDER BY c DESC, id) AS rank
        |  FROM scored
        |), u AS (
        |  SELECT id, rank FROM bmr
        |  UNION ALL SELECT id, rank FROM dr WHERE rank <= 50
        |)
        |SELECT CAST(0 AS BIGINT) AS query_id, id, count(*) AS n_lists,
        |  sum(CAST(1 AS DOUBLE) / (60 + rank)) AS rrf
        |FROM u GROUP BY id
        |""".stripMargin,

    "j10_asof_join" ->
      """WITH l AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, epoch_us(ts) AS rts, max(value) AS err_value
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
        |)
        |SELECT l.user_id, l.ts_us, l.event_id, l.value,
        |  CASE WHEN r.rts >= l.ts_us - 3600000000 THEN r.rts END AS r_rts,
        |  CASE WHEN r.rts >= l.ts_us - 3600000000 THEN r.err_value
        |    END AS r_err_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.rts
        |""".stripMargin,

    "w_stream_join" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, event_id AS r_event_id, epoch_us(ts) AS r_ts_us
        |  FROM events WHERE event_type = 'error'
        |)
        |SELECT l.user_id, l.event_id, l.ts_us, r.r_event_id, r.r_ts_us
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND r.r_ts_us BETWEEN l.ts_us - 86400000000 AND l.ts_us
        |""".stripMargin,

    "w_file_stream" ->
      ("SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), " +
        "'%Y-%m-%d %H:%M:%S') AS hour, event_type, count(*) AS n, " +
        "round(sum(value), 2) AS sum_value FROM events GROUP BY 1, 2"),

    "d_simhash_pairs" ->
      ("SELECT true AS planted_all_recovered, true AS planted_nonvacuous, " +
        "true AS pairs_within_radius"),

    "mm_decode_rejects" ->
      ("SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'bad_magic' " +
        "ELSE 'truncated' END AS reason FROM documents WHERE doc_id % 7 <= 1"),

    "s_ivf_staleness" ->
      "SELECT true AS drift_separates, true AS in_dist_near_zero",

    "a15_sketch_profile" ->
      ("SELECT true AS distinct_within_rsd, true AS p50_within_eps, " +
        "true AS p95_within_eps"),

    "t_bloom_contamination" ->
      "SELECT true AS no_false_negatives, true AS fp_rate_bounded",

    "a16_salted_agg" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users
        |FROM events GROUP BY event_type
        |""".stripMargin,

    "w_stream_curate" ->
      "SELECT true AS stream_equals_batch, true AS survivors_nonempty",

    "t_bm25" ->
      """WITH norm AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |    AS t
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, t, len(string_split(t, ' ')) AS dl FROM norm
        |), stats AS (
        |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |  FROM d
        |), ex AS (
        |  SELECT doc_id, dl, unnest(string_split(t, ' ')) AS word FROM d
        |), tf AS (
        |  SELECT doc_id, dl, word, count(*) AS tf FROM ex
        |  WHERE word IN ('spark', 'vector', 'stream') GROUP BY 1, 2, 3
        |), idf AS (
        |  SELECT word, ln(1 + (n - count(*) + 0.5) / (count(*) + 0.5)) AS idf
        |  FROM tf, stats GROUP BY word, n
        |)
        |SELECT doc_id, count(*) AS n_terms_hit,
        |  round(sum(idf * tf * 2.2 /
        |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        |FROM tf JOIN idf USING (word), stats
        |GROUP BY doc_id
        |""".stripMargin,

    "d_dup_spans" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 2 = 0
        |), norm AS (
        |  SELECT doc_id,
        |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
        |      ' ') AS w
        |  FROM corpus
        |), p AS (
        |  SELECT doc_id, w, CAST(unnest(range(len(w) - 4)) AS BIGINT) AS pos
        |  FROM norm WHERE len(w) >= 5
        |), g AS (
        |  SELECT doc_id, pos, array_to_string(w[pos + 1 : pos + 5], ' ')
        |    AS gram
        |  FROM p
        |), dup AS (
        |  SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2
        |), m AS (
        |  SELECT doc_id, pos FROM g JOIN dup USING (gram)
        |), s AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN lag(pos) OVER win IS NULL
        |      OR pos > lag(pos) OVER win + 5 THEN 1 ELSE 0 END AS new_span
        |  FROM m WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
        |), sp AS (
        |  SELECT doc_id, pos,
        |    sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |  FROM s
        |)
        |SELECT doc_id, min(pos) AS span_start,
        |  max(pos) + 4 AS span_end, count(*) AS n_grams
        |FROM sp GROUP BY doc_id, span_id
        |""".stripMargin,

    "d_cut_spans" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 2 = 0
        |), norm AS (
        |  SELECT doc_id,
        |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
        |      ' ') AS w
        |  FROM corpus
        |), p AS (
        |  SELECT doc_id, w, CAST(unnest(range(len(w) - 4)) AS BIGINT) AS pos
        |  FROM norm WHERE len(w) >= 5
        |), g AS (
        |  SELECT doc_id, pos, array_to_string(w[pos + 1 : pos + 5], ' ')
        |    AS gram
        |  FROM p
        |), dup AS (
        |  SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2
        |), cov AS (
        |  SELECT DISTINCT doc_id, pos + o.o AS cpos
        |  FROM g JOIN dup USING (gram), (
        |    SELECT CAST(unnest(range(5)) AS BIGINT) AS o) o
        |), words AS (
        |  SELECT doc_id, unnest(w) AS word,
        |    CAST(unnest(range(len(w))) AS BIGINT) AS wp
        |  FROM norm
        |), kept AS (
        |  SELECT wd.doc_id,
        |    string_agg(wd.word, ' ' ORDER BY wd.wp) AS clean_text,
        |    count(*) AS n_kept
        |  FROM words wd LEFT JOIN cov c
        |    ON wd.doc_id = c.doc_id AND wd.wp = c.cpos
        |  WHERE c.cpos IS NULL
        |  GROUP BY wd.doc_id
        |)
        |SELECT n.doc_id, coalesce(k.clean_text, '') AS clean_text,
        |  coalesce(k.n_kept, 0) AS n_kept,
        |  len(n.w) - coalesce(k.n_kept, 0) AS n_removed
        |FROM norm n LEFT JOIN kept k USING (doc_id)
        |""".stripMargin,

    "mm_resize_ppm" ->
      """WITH dims AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents
        |), px AS (
        |  SELECT doc_id, w, h, CAST(unnest(range(w * h)) AS BIGINT) AS k
        |  FROM dims
        |), kept AS (
        |  SELECT doc_id,
        |    CAST((w + 1) // 2 AS INT) AS width,
        |    CAST((h + 1) // 2 AS INT) AS height,
        |    doc_id * 31 + k * 7 AS base
        |  FROM px WHERE (k % w) % 2 = 0 AND (k // w) % 2 = 0
        |)
        |SELECT doc_id, width, height,
        |  CAST(sum(base % 256) AS BIGINT) AS sum_r,
        |  CAST(sum((base + 53) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum((base + 106) % 256) AS BIGINT) AS sum_b
        |FROM kept GROUP BY 1, 2, 3
        |""".stripMargin,

    "d_hash_split" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split'),
        |      1, 8))::BIGINT % 1000000) / 1000000.0 AS u
        |  FROM documents
        |)
        |SELECT doc_id, CASE WHEN u < 0.8 THEN 'train'
        |  WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM u
        |""".stripMargin,

    "d_mix_resample" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
        |      WHEN 'src2' THEN 0.0 ELSE 1.0 END AS wt,
        |    (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':resample'),
        |      1, 8))::BIGINT % 1000000) / 1000000.0 AS u
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, source,
        |    CAST(floor(wt) + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END
        |      AS INT) AS n
        |  FROM w
        |)
        |SELECT doc_id, source, CAST(unnest(range(1, n + 1)) AS INT) AS copy
        |FROM n WHERE n > 0
        |""".stripMargin,

    "t_lm_score" ->
      """WITH norm AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |    AS t
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id, unnest(string_split(t, ' ')) AS word FROM norm
        |), wc AS (
        |  SELECT word, count(*) AS c FROM ex GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(c) AS DOUBLE) AS total FROM wc
        |), top AS (
        |  SELECT word, ln(c / total) AS logp FROM wc, tot
        |  ORDER BY c DESC, word ASC LIMIT 500
        |)
        |SELECT doc_id, count(*) AS n_words,
        |  round(avg(-coalesce(logp, ln(1.0 / total))), 4) AS lm_score
        |FROM ex LEFT JOIN top USING (word), tot
        |GROUP BY doc_id
        |""".stripMargin,

    "t_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'),
        |      x -> x <> '') AS tk
        |  FROM documents
        |), n AS (
        |  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
        |  FROM toks WHERE len(tk) > 0
        |), k AS (
        |  SELECT doc_id, tk, n,
        |    CASE WHEN n <= 40 THEN 0
        |      ELSE CAST(ceil((n - 40) / 30.0) AS BIGINT) END AS last_ix
        |  FROM n
        |), ix AS (
        |  SELECT doc_id, tk, n, unnest(range(0, last_ix + 1)) AS i FROM k
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_ix,
        |  array_to_string(tk[(i * 30 + 1):(i * 30 + 40)], ' ')
        |    AS chunk_text,
        |  CAST(least(40, n - i * 30) AS BIGINT) AS n_tokens
        |FROM ix
        |""".stripMargin,

    "d_line_dedup" ->
      """WITH b AS (
        |  SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents
        |), lines AS (
        |  SELECT d.doc_id - off AS gid, off AS ix, d.text AS line
        |  FROM documents d, unnest(range(0, 4)) AS t(off), b
        |  WHERE d.doc_id - off >= b.lo AND d.doc_id - off <= b.hi - 3
        |), sv AS (
        |  -- encode (gid, ix) lexicographically, OFFSET BY lo so the
        |  -- encoding stays non-negative and // and % decode exactly
        |  -- (truncating division would misdecode negative ids)
        |  SELECT line, min((gid - b.lo) * 4 + ix) AS v
        |  FROM lines, b WHERE len(line) >= 1 GROUP BY line
        |), k AS (
        |  SELECT l.gid, l.ix, l.line,
        |    (sv.line IS NULL OR
        |     (l.gid = sv.v // 4 + b.lo AND l.ix = sv.v % 4)) AS keep
        |  FROM lines l LEFT JOIN sv USING (line), b
        |)
        |SELECT gid AS doc_id,
        |  coalesce(string_agg(CASE WHEN keep THEN line END,
        |    chr(10) ORDER BY ix), '') AS text,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dropped
        |FROM k GROUP BY gid
        |""".stripMargin,

    "d_source_cap" ->
      """SELECT source, CAST(rn AS BIGINT) AS rank, doc_id,
        |  CAST(n_chars AS DOUBLE) AS score
        |FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
        |)
        |WHERE rn <= 20
        |""".stripMargin,

    "s_ivf_radius" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |  WHERE vec_id < 8
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |      CAST(e.embedding AS DOUBLE[])) AS cos_raw
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
        |)
        |SELECT query_id, id, round(cos_raw, 6) AS cosine FROM scored
        |WHERE cos_raw >= 0.25
        |""".stripMargin,

    "s_radius_search" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |  WHERE vec_id < 8
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |      CAST(e.embedding AS DOUBLE[])) AS cos_raw
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
        |)
        |SELECT query_id, id, round(cos_raw, 6) AS cosine FROM scored
        |WHERE cos_raw >= 0.25
        |""".stripMargin,

    "d_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':shuffle') AS hx
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, hx,
        |    (('0x' || substring(hx, 1, 8))::BIGINT % 8) AS shard
        |  FROM h
        |)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id)
        |    AS BIGINT) AS pos
        |FROM s
        |""".stripMargin,

    "t_quality_band" ->
      ("SELECT true AS lo_within_exact_neighborhood, " +
        "true AS hi_within_exact_neighborhood, " +
        "true AS kept_fraction_near_half"),

    "t_vocab" ->
      """WITH norm AS (
        |  SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents
        |), ex AS (
        |  SELECT unnest(string_split(t, ' ')) AS word FROM norm
        |), wc AS (
        |  SELECT word, count(*) AS n FROM ex GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n) AS DOUBLE) AS total FROM wc
        |), top AS (
        |  SELECT word, n, row_number() OVER (ORDER BY n DESC, word ASC)
        |    AS rn
        |  FROM wc ORDER BY n DESC, word ASC LIMIT 100
        |)
        |SELECT CAST(rn AS BIGINT) AS rank, word, n,
        |  round(n / total, 6) AS p,
        |  round(sum(n) OVER (ORDER BY rn) / total, 6) AS coverage
        |FROM top, tot
        |""".stripMargin,

    "t_pack" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE
        |      len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
        |    AS cum
        |  FROM t
        |)
        |SELECT doc_id, shard,
        |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin, n_tokens
        |FROM c
        |""".stripMargin)
}
