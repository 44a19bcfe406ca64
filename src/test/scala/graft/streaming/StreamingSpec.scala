package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, Session}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private val events = Seq(
    Event(1, ts(0), 100, "click", 1.0),
    Event(2, ts(10), 100, "click", 2.0),
    Event(3, ts(120), 100, "view", 4.0),   // 110-min gap -> new session
    Event(4, ts(5), 200, "click", 8.0))

  test("batch sessionization: gap splits, per-session aggregates") {
    val sessions = EventStreams.sessionizeBatch(events.toDF(), gapMinutes = 30)
      .as[(Long, Timestamp, Long, Double)].collect()
      .map(s => (s._1, s._2, s._3, s._4)).sortBy(s => (s._1, s._2.getTime))
    assert(sessions.length === 3)
    assert(sessions(0) === ((100L, ts(0), 2L, 3.0)))  // events 1+2
    assert(sessions(1) === ((100L, ts(120), 1L, 4.0)))
    assert(sessions(2) === ((200L, ts(5), 1L, 8.0)))
  }

  test("intervalJoin batch face: inclusive trailing window, key-scoped") {
    val l = Seq((10L, ts(60), 1L), (11L, ts(200), 1L), (12L, ts(60), 2L))
      .toDF("event_id", "ts", "user_id")
    val r = Seq((20L, ts(0), 1L), (21L, ts(60), 1L), (22L, ts(61), 1L),
      (23L, ts(59), 2L))
      .toDF("event_id", "ts", "user_id")
    val got = EventStreams.intervalJoin(l, r, lookbackMinutes = 60)
      .select("event_id", "r_event_id").as[(Long, Long)].collect().toSet
    assert(got === Set(
      (10L, 20L), // exactly lookback ago: inclusive lower bound
      (10L, 21L), // same instant: inclusive upper bound
      // (10,22) excluded: right is strictly AFTER the left event
      // (11,*) excluded: every right ts is > 60 min before ts(200)
      (12L, 23L))) // key 2 only sees key-2 rows
  }

  test("intervalJoin left_outer: null-padded rows stream out once the " +
    "watermark proves no match can arrive") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Long)]
    val memR = MemoryStream[(Long, Timestamp, Long)]
    val out = EventStreams.intervalJoin(
      memL.toDS().toDF("event_id", "ts", "user_id"),
      memR.toDS().toDF("event_id", "ts", "user_id"),
      lookbackMinutes = 60, watermark = "10 minutes",
      joinType = "left_outer")
    val q = out.writeStream.format("memory").queryName("ij_outer")
      .outputMode("append").start()
    try {
      memL.addData((10L, ts(60), 1L), (11L, ts(200), 1L))
      memR.addData((21L, ts(60), 1L)) // matches 10, not 11
      q.processAllAvailable()
      // sentinel far past every horizon forces the outer emission
      memL.addData((99L, ts(5000), 9L)); memR.addData((98L, ts(5000), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ij_outer").filter("user_id != 9")
      .select("event_id", "r_event_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(got === Set((10L, Some(21L)), (11L, None)))
  }

  test("asOfEnrich: backward-inclusive match, left-outer, multi-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Long)]
    val memR = MemoryStream[(Long, Timestamp, Long)]
    val out = AsOfStream.asOfEnrich(
      memL.toDS().toDF("event_id", "ts", "user_id"),
      memR.toDS().toDF("event_id", "ts", "user_id"),
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("asof_spec")
      .outputMode("append").start()
    try {
      memL.addData((12L, ts(5), 1L), (11L, ts(30), 1L), (13L, ts(10), 2L))
      memR.addData((20L, ts(0), 1L), (21L, ts(60), 1L))
      q.processAllAvailable()
      // batch 2: a left at the exact ts of a right (inclusive bound)
      memL.addData((10L, ts(60), 1L))
      memR.addData((22L, ts(90), 1L))
      q.processAllAvailable()
      memL.addData((99L, ts(5000), 9L)); memR.addData((98L, ts(5000), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_spec").filter("user_id != 9")
      .select(col("event_id"), col("r_event_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(got === Set(
      (12L, Some(20L)), // latest right at or before ts(5) is ts(0)
      (11L, Some(20L)), // ts(60) right is in the future of ts(30)
      (10L, Some(21L)), // equal-instant right matches (inclusive)
      (13L, None)))     // user 2 has no state rows at all
  }

  test("asOfEnrich: randomized multi-batch run equals the batch as-of " +
    "join; state stays bounded after the horizon passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(29)
    val lefts = (1 to 120).map(i =>
      (1000L + i, ts(rnd.nextInt(300).toLong), rnd.nextInt(6).toLong))
    // rights pre-aggregated per (user, ts) — the j10 tie discipline
    val rights = (1 to 80).map(i =>
        (2000L + i, ts(rnd.nextInt(300).toLong), rnd.nextInt(6).toLong))
      .groupBy(r => (r._3, r._2.getTime)).values.map(_.maxBy(_._1)).toSeq
    val memL = MemoryStream[(Long, Timestamp, Long)]
    val memR = MemoryStream[(Long, Timestamp, Long)]
    val out = AsOfStream.asOfEnrich(
      memL.toDS().toDF("event_id", "ts", "user_id"),
      memR.toDS().toDF("event_id", "ts", "user_id"),
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("asof_rand")
      .outputMode("append").start()
    try {
      // batches split at common time boundaries, so no feed row is ever
      // below the post-batch watermark (nothing is late-dropped and the
      // stream must equal the batch face exactly)
      for (lo <- Seq(0L, 100L, 200L)) {
        val hi = lo + 100L
        def in(t: Timestamp) = {
          val m = (t.getTime - ts(0).getTime) / 60000L
          m >= lo && m < hi
        }
        memL.addData(lefts.filter(e => in(e._2)): _*)
        memR.addData(rights.filter(e => in(e._2)): _*)
        q.processAllAvailable()
      }
      memL.addData((-1L, ts(5000), -1L)); memR.addData((-2L, ts(5000), -1L))
      q.processAllAvailable()
      // bounded state: one state row per live key — the 6 corpus keys
      // hold one compacted right each, the sentinel key its pending left
      val stateRows = q.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(stateRows <= 7, s"state not compacted: $stateRows rows")
    } finally q.stop()
    val got = spark.table("asof_rand").filter("user_id != -1")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("r_event_id"), unix_micros(col("r_ts")))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    val want = AsOfStream.asOfEnrichBatch(
        lefts.toDF("event_id", "ts", "user_id"),
        rights.toDF("event_id", "ts", "user_id"))
      .select("user_id", "event_id", "ts_us", "r_event_id", "r_ts_us")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got.size === lefts.size)
    assert(got === want)
  }

  test("asOfEnrich watermark boundary: Spark's FMGWS input filter drops " +
    "arrivals AT the watermark (LessThanOrEqual), so strict-below " +
    "resolution is final; strictly-above arrivals land") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Long)]
    val memR = MemoryStream[(Long, Timestamp, Long)]
    val out = AsOfStream.asOfEnrich(
      memL.toDS().toDF("event_id", "ts", "user_id"),
      memR.toDS().toDF("event_id", "ts", "user_id"),
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("asof_boundary")
      .outputMode("append").start()
    try {
      // batch 1: left at ts(60), older right at ts(0); wm -> 50
      memL.addData((10L, ts(60), 1L))
      memR.addData((20L, ts(0), 1L))
      q.processAllAvailable()
      // batch 2: advance the watermark to EXACTLY the left's instant
      // (70 - 10 = 60) via another key; the left stays pending (strict)
      memR.addData((97L, ts(70), 8L))
      q.processAllAvailable()
      // batch 3a: a right at exactly ts(60) == watermark. The operator
      // finality contract rests on Spark DROPPING this arrival — the
      // decompiled WatermarkSupport.watermarkExpression predicate is
      // LessThanOrEqual(ts, wm) — so the left must keep its ts(0)
      // match. If a Spark upgrade relaxed the filter to strictly-older,
      // the pending left would see this row instead and the expected
      // match below would flip to 21 (strict-below resolution keeps
      // either behavior exact; this test pins which one is in force).
      memR.addData((21L, ts(60), 1L))
      q.processAllAvailable()
      // batch 3b: a left and right strictly above the watermark — the
      // equal-instant pair must match inclusively as usual
      memL.addData((11L, ts(61), 1L))
      memR.addData((22L, ts(61), 1L))
      q.processAllAvailable()
      memL.addData((99L, ts(5000), 9L)); memR.addData((98L, ts(5000), 9L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_boundary").filter("user_id = 1")
      .select(col("event_id"), col("r_event_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(got === Set(
      (10L, Some(20L)), // the ==wm right was dropped before the state op
      (11L, Some(22L)))) // >wm arrivals land and match inclusively
  }

  test("asOfEnrich µs round-trip: sub-millisecond event times survive " +
    "the state passage") {
    val t = new Timestamp(1700000000123L)
    t.setNanos(123456000) // .123456 s
    assert(AsOfStream.toUs(t) === 1700000000L * 1000000L + 123456L)
    assert(AsOfStream.toTs(AsOfStream.toUs(t)) === t)
  }

  test("CdcStream: multi-batch folds equal the one-shot batch apply; " +
    "replayed batch rewrites identical content; old versions vacuum") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("cdcstream")
    val path = s"$dir/snap"
    val initial = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val b1 = Seq((2L, "b2", 21.0, "U", 1L), (4L, "d", 40.0, "I", 2L))
    val b2 = Seq((3L, "x", 0.0, "D", 3L), (2L, "b3", 22.0, "U", 4L))
    val mem = MemoryStream[(Long, String, Double, String, Long)]
    val q = CdcStream.run(
      mem.toDS().toDF("id", "name", "bal", "op", "seq"),
      path, initial, Seq("id"), s"$dir/ckpt")
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = CdcStream.currentView(spark, path).get
      .as[(Long, String, Double)].collect().toSet
    val want = graft.ops.Cdc.applySnapshot(initial,
        (b1 ++ b2).toDF("id", "name", "bal", "op", "seq"), Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(got === want)
    assert(got === Set((1L, "a", 10.0), (2L, "b3", 22.0), (4L, "d", 40.0)))
    // the deleted key keeps a TOMBSTONE in the raw snapshot (with the
    // delete's sequence), so out-of-order stragglers cannot resurrect it
    val tomb = CdcStream.snapshot(spark, path).get
      .filter("op = 'D'").select("id", "seq")
      .as[(Long, Long)].collect().toSet
    assert(tomb === Set((3L, 3L)))
    // replay of the last batch (fold from the strictly-older version)
    // must rewrite identical content
    CdcStream.applyBatch(spark, path, initial,
      b2.toDF("id", "name", "bal", "op", "seq"), Seq("id"), batchId = 1L)
    assert(CdcStream.currentView(spark, path).get
      .as[(Long, String, Double)].collect().toSet === want)
    // an out-of-order straggler OLDER than both the delete and the last
    // update changes nothing in the serving view
    CdcStream.applyBatch(spark, path, initial,
      Seq((3L, "zombie", 1.0, "U", 2L), (2L, "old", 1.0, "U", 2L))
        .toDF("id", "name", "bal", "op", "seq"), Seq("id"), batchId = 3L)
    assert(CdcStream.currentView(spark, path).get
      .as[(Long, String, Double)].collect().toSet === want)
    // vacuum: a third fold retires the oldest version (retain = 2)
    CdcStream.applyBatch(spark, path, initial,
      Seq((9L, "z", 90.0, "I", 9L)).toDF("id", "name", "bal", "op", "seq"),
      Seq("id"), batchId = 5L)
    val vs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(vs.length === 2 && vs.last === "v5")
  }

  test("enrich: stream-static broadcast join, per micro-batch, inner") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((100L, "gold"), (200L, "basic")).toDF("cust", "tier")
    val mem = MemoryStream[Event]
    val out = EventStreams.enrich(mem.toDS().toDF(), dim, "user_id", "cust")
    val q = out.writeStream.format("memory").queryName("enrich_spec")
      .outputMode("append").start()
    try {
      mem.addData(events.take(2): _*)
      q.processAllAvailable()
      mem.addData(Event(9, ts(1), 999, "view", 5.0)) // no dim row → dropped
      mem.addData(events.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enrich_spec")
      .select("event_id", "tier").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "gold"), (2L, "gold"), (3L, "gold"),
      (4L, "basic")))
    assert(!spark.table("enrich_spec").columns.contains("cust"))
  }

  test("DedupStream: batches dedupe against the growing fingerprint index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("sdedup")
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.run(mem.toDS().toDF("doc_id", "text"),
      s"$dir/idx", s"$dir/out", s"$dir/ckpt")
    try {
      mem.addData((1L, "alpha beta"), (2L, "gamma delta"),
        (3L, "Alpha  Beta")) // in-batch dup of 1
      q.processAllAvailable()
      mem.addData((10L, "alpha beta"), // cross-batch dup → dropped
        (11L, "epsilon zeta"))         // novel → accepted
      q.processAllAvailable()
    } finally q.stop()
    val accepted = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet
    assert(accepted === Set(1L, 2L, 11L))
    // the index now holds all three fingerprints
    assert(spark.read.parquet(s"$dir/idx").count() === 3)
    // replaying an already-folded batch is a no-op (exactly-once per content)
    val n = DedupStream.dedupBatch(spark, s"$dir/idx", s"$dir/out",
      Seq((10L, "alpha beta"), (11L, "epsilon zeta")).toDF("doc_id", "text"))
    assert(n === 0L)
  }

  test("dedupBatch crash windows: corpus-write-then-crash replays to " +
    "identical rows (no duplicates); index-append-then-crash replays " +
    "keep the partition and report the true count") {
    val dir = tmpDir("sdedupcrash")
    val (idx, out) = (s"$dir/idx", s"$dir/out")
    val b = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .toDF("doc_id", "text")
    val n1 = DedupStream.dedupBatch(spark, idx, out, b, Some(0L))
    assert(n1 === 2L)
    // window A: crash BETWEEN the corpus partition write and the index
    // append — simulate by deleting the index, leaving the partition
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(idx))
    val nA = DedupStream.dedupBatch(spark, idx, out, b, Some(0L))
    assert(nA === 2L)
    assert(spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L),
      "replay must OVERWRITE the partition, not append duplicates")
    assert(spark.read.parquet(idx).count() === 2L, "index repopulated")
    // window B: crash AFTER the index append — full replay: partition
    // kept, true count reported (not 0)
    val nB = DedupStream.dedupBatch(spark, idx, out, b, Some(0L))
    assert(nB === 2L)
    assert(spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // window C: PARTIALLY committed index append (non-atomic committer /
    // object-store rename landed a subset of the fingerprint files
    // before the crash) — the replayed probe recomputes only the
    // not-yet-indexed survivors, and the partition rewrite must UNION
    // them with the landed rows instead of replacing the full set with
    // the subset
    rm(new java.io.File(idx))
    graft.ops.Dedup.exactSurvivors(
        Seq((1L, "alpha beta")).toDF("doc_id", "text"))
      .write.parquet(idx) // index knows doc 1 only — the partial append
    val nC = DedupStream.dedupBatch(spark, idx, out, b, Some(0L))
    assert(nC === 2L, "replay reports the partition's TRUE row count")
    assert(spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L),
      "previously-accepted rows must survive a partial-append replay")
    assert(spark.read.parquet(idx).count() === 2L,
      "the missing fingerprints complete the index")
    // window D: a STALE partition left by a previous run (fresh run —
    // no index yet — against a reused outPath, batch ids restarting at
    // 0): the stale rows are not in this run's index, so the
    // union-on-replay must NOT resurrect them; the new batch replaces
    // the partition as truth
    rm(new java.io.File(idx))
    Seq((99L, "stale old content never accepted by this run"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/batch_id=0")
    val nD = DedupStream.dedupBatch(spark, idx, out, b, Some(0L))
    assert(nD === 2L)
    assert(spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L),
      "stale rows from a previous run must not resurrect")
  }

  test("dedupStream: duplicate keys within and across batches land once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val query = EventStreams.dedupStream(
      mem.toDS().toDF("id", "ts", "v"), Seq("id"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // same-batch duplicate of id=1, then a cross-batch replay of id=2
      mem.addData((1L, ts(0), "a"), (1L, ts(0), "a"), (2L, ts(1), "b"))
      query.processAllAvailable()
      mem.addData((2L, ts(1), "b"), (3L, ts(2), "c"))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("dedup_stream")
      .as[(Long, Timestamp, String)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._3)).toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("streaming sessionization (flatMapGroupsWithState) closes sessions " +
    "on gap and agrees with batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = EventStreams.sessionizeStream(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      query.processAllAvailable()
      val closed = spark.table("sessions").as[Session].collect()
        .sortBy(_.user_id)
      // user 100's first session closes because event 3 is past the gap;
      // user 200's idle session closes via EVENT-TIME timeout once the
      // watermark (max ts - 10 min) passes its gap deadline. User 100's
      // second session (event 3) is still open in state.
      assert(closed.toSeq === Seq(
        Session(100L, ts(0), 2L, 3.0), Session(200L, ts(5), 1L, 8.0)))
      // every streaming-closed session appears identically in the batch path
      val batch = EventStreams.sessionizeBatch(events.toDF(), gapMinutes = 30)
        .select("user_id", "session_start", "n_events", "total_value")
        .as[(Long, java.sql.Timestamp, Long, Double)].collect()
        .map(t => Session(t._1, t._2, t._3, t._4)).toSet
      assert(closed.forall(batch.contains))
    } finally query.stop()
  }

  test("sessionizer per-key state is O(1) for an always-active key: one " +
    "32-byte aggregate regardless of session length") {
    import EventStreams.{SessionAgg, TailEv}
    // a bot that fires every minute for a week: one never-ending session.
    // The round-5 List[Event] state grew one entry per event; the
    // aggregate-interval state must hold exactly ONE SessionAgg.
    val gapMs = 30 * 60000L
    val wmDelayMs = 10 * 60000L
    val batchSize = 100
    val nEvents = 10080 // minutes in a week
    var state: List[SessionAgg] = Nil
    var closed = List.empty[SessionAgg]
    var prevBatchMax = Long.MinValue
    (0 until nEvents).grouped(batchSize).foreach { minutes =>
      val wm = if (prevBatchMax == Long.MinValue) 0L
        else prevBatchMax - wmDelayMs // Spark: wm from the PREVIOUS batch
      val batch = minutes.map(m => TailEv(ts(m.toLong), 1.0)).toList
      val (c, next) = EventStreams.advance(state, batch, wm, gapMs)
      closed = closed ++ c
      state = next
      prevBatchMax = batch.last.ts.getTime
      assert(state.size === 1, s"state grew past one aggregate: $state")
    }
    assert(closed.isEmpty) // the gap never fired: still one open session
    val agg = state.head
    assert(agg.session_start === ts(0))
    assert(agg.n === nEvents.toLong)
    assert(math.abs(agg.total - nEvents.toDouble) < 1e-9)
  }

  test("sessionizer advance: randomized multi-batch equivalence with the " +
    "batch face under bounded out-of-order arrival AND late gap-bridging") {
    import EventStreams.{SessionAgg, TailEv}
    val gapMs = 30 * 60000L
    val wmDelayMs = 10 * 60000L
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      // random event times over ~10 hours with occasional >gap holes;
      // half the holes get a BRIDGE event inside them (within gap of the
      // hole's left edge) that will be delivered maximally late — the
      // exact scenario that must NOT split the session: emitting on first
      // gap sighting would close a session a legal above-watermark late
      // arrival then bridges
      var t = 0L
      var bridges = List.empty[Long]
      val times = (0 until 150).flatMap { _ =>
        if (rnd.nextInt(10) == 0) {
          val left = t
          t += gapMs + 60000L + rnd.nextInt(600000)
          if (rnd.nextBoolean()) { // bridge sits within gap of BOTH edges
            val b = left + math.max(gapMs * 3 / 4, t - left - gapMs + 60000L)
            bridges ::= b; Seq(t)
          } else Seq(t)
        } else { t += rnd.nextInt(8 * 60000).toLong; Seq(t) }
      }
      val mk = (m: Long) => TailEv(
        new Timestamp(1700000000000L + m), rnd.nextInt(10) + 1.0)
      val events = times.map(mk(_))
      val bridgeEvs = bridges.map(mk(_))
      // arrival order: bounded shuffle for normal events; bridges arrive
      // as late as the watermark allows (max positive lateness key)
      val arrival = (events.map(e =>
          e -> (e.ts.getTime + rnd.nextInt(wmDelayMs.toInt) - wmDelayMs / 2))
        ++ bridgeEvs.map(e => e -> (e.ts.getTime + wmDelayMs)))
        .sortBy(_._2).map(_._1)
      var state: List[SessionAgg] = Nil
      var closed = List.empty[SessionAgg]
      var maxSeen = Long.MinValue
      def step(batchRaw: Seq[TailEv]): Unit = {
        val wm = if (maxSeen == Long.MinValue) 0L else maxSeen - wmDelayMs
        val batch = batchRaw.filter(_.ts.getTime >= wm).toList // late-drop
        val (c, next) = EventStreams.advance(state, batch, wm, gapMs)
        closed = closed ++ c
        state = next
        if (batchRaw.nonEmpty)
          maxSeen = math.max(maxSeen, batchRaw.map(_.ts.getTime).max)
      }
      arrival.grouped(25).foreach(step)
      // flush: march the watermark past everything (the timeout path)
      maxSeen += 2 * (gapMs + wmDelayMs)
      step(Nil)
      closed = closed ++ state
      // reference: full-buffer batch sessionization over delivered events
      val delivered = {
        // replay the same late-drop the stream applied
        var seen = Long.MinValue
        val kept = List.newBuilder[TailEv]
        arrival.grouped(25).foreach { b =>
          val wm = if (seen == Long.MinValue) 0L else seen - wmDelayMs
          kept ++= b.filter(_.ts.getTime >= wm)
          seen = math.max(seen, b.map(_.ts.getTime).max)
        }
        kept.result()
      }
      val sorted = delivered.sortBy(_.ts.getTime)
      val expected = sorted.tail.foldLeft(
        List(List(sorted.head))) { case (acc @ cur :: rest, e) =>
          if (e.ts.getTime - cur.head.ts.getTime > gapMs) List(e) :: acc
          else (e :: cur) :: rest
        }.map(_.reverse).reverse
        .map(g => (g.head.ts, g.size.toLong, g.map(_.value).sum))
      val got = closed.sortBy(_.session_start.getTime)
        .map(s => (s.session_start, s.n, s.total))
      assert(got === expected, s"seed $seed: stream/batch mismatch")
    }
  }

  test("sessionizer advance: gap-separated sessions stay in state until " +
    "the watermark seals them; a late event bridges two open sessions") {
    import EventStreams.{SessionAgg, TailEv}
    val gapMs = 30 * 60000L
    // batch 1: apparent sessions at {0,10} and {55}; watermark 0 means
    // NOTHING is sealed — both stay open (the old design emitted {0,10}
    // here, which the bridge below proves premature)
    val b1 = List(TailEv(ts(0), 1.0), TailEv(ts(10), 2.0),
      TailEv(ts(55), 4.0))
    val (c1, s1) = EventStreams.advance(Nil, b1, 0L, gapMs)
    assert(c1.isEmpty)
    assert(s1.map(a => (a.session_start, a.last, a.n, a.total)) ===
      List((ts(0), ts(10), 2L, 3.0), (ts(55), ts(55), 1L, 4.0)))
    // batch 2: a late event at 35 is within gap of BOTH 10 and 55 —
    // the two open sessions merge into one
    val (c2, s2) = EventStreams.advance(s1,
      List(TailEv(ts(35), 8.0)), ts(20).getTime, gapMs)
    assert(c2.isEmpty)
    assert(s2 === List(SessionAgg(ts(0), ts(55), 4L, 15.0)))
    // batch 3: a fresh session far ahead; watermark past 55+gap seals
    // the merged session and emits it WHOLE
    val (c3, s3) = EventStreams.advance(s2,
      List(TailEv(ts(300), 16.0)), ts(290).getTime, gapMs)
    assert(c3 === List(SessionAgg(ts(0), ts(55), 4L, 15.0)))
    assert(s3.map(_.session_start) === List(ts(300)))
  }

  test("file-based stream source: multi-file corpus ingests incrementally " +
    "(maxFilesPerTrigger) and agrees with the batch aggregation") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("filestream")
    // events-table shape: ts is raw long NANOSECONDS in the files
    val raw = (0 until 400).map { i =>
      (i.toLong, (1700000000000L + i * 60000L) * 1000000L,
        (i % 7).toLong, if (i % 2 == 0) "click" else "view", 1.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    raw.repartition(3).write.parquet(s"$dir/events.parquet")
    val out = EventStreams.windowedCounts(EventStreams.readStream(
      spark, dir, Map("maxFilesPerTrigger" -> "1")))
    val q = out.writeStream.format("memory").queryName("fstream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // one micro-batch per file: incremental discovery actually happened
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        s"expected >=3 file-triggered batches, got " +
          q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
    val got = spark.table("fstream")
      .select(col("hour").cast("string"), col("event_type"), col("n"),
        col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    val batch = raw
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("hour").cast("string"), col("event_type"), col("n"),
        col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === batch)
  }

  test("checkpoint restart: a stopped query resumes from its offsets — " +
    "new files only, state restored, result equals the batch answer") {
    val dir = tmpDir("cprestart")
    val src = s"$dir/events.parquet"
    val cp = s"$dir/_checkpoint"
    def mk(lo: Int, hi: Int) = (lo until hi).map { i =>
      (i.toLong, (1700000000000L + i * 60000L) * 1000000L,
        (i % 7).toLong, if (i % 2 == 0) "click" else "view", 1.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    mk(0, 200).write.parquet(src)
    def start(name: String) = EventStreams.windowedCounts(
      EventStreams.readStream(spark, dir))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", cp)
      .outputMode("complete").start()
    val q1 = start("cpr1")
    try q1.processAllAvailable() finally q1.stop()
    // second tranche lands while no query is running
    mk(200, 300).write.mode("append").parquet(src)
    val q2 = start("cpr2")
    try {
      q2.processAllAvailable()
      // the restart must NOT re-ingest tranche 1: committed offsets in
      // the checkpoint cover it, so only the 100 new rows flow
      val reRead = q2.recentProgress.map(_.numInputRows).sum
      assert(reRead === 100L, s"restart re-ingested rows: $reRead")
    } finally q2.stop()
    val got = spark.table("cpr2")
      .select(col("hour").cast("string"), col("event_type"), col("n"),
        col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    val batch = mk(0, 300)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("hour").cast("string"), col("event_type"), col("n"),
        col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === batch)
  }

  test("file-based stream source: timestamp[us] corpus (current encoding) " +
    "agrees with the batch aggregation — no silent µs-as-ns misread") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("filestream_us")
    // same event shape, but ts written as a true µs TIMESTAMP_NTZ column
    // (what the corpus generator emits since 2026-08); the probed-schema
    // stream source must land identical windows to the legacy-ns twin
    val raw = (0 until 400).map { i =>
      (i.toLong, (1700000000000L + i * 60000L) * 1000L,
        (i % 7).toLong, if (i % 2 == 0) "click" else "view", 1.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
    raw.repartition(2).write.parquet(s"$dir/events.parquet")
    val out = EventStreams.windowedCounts(EventStreams.readStream(spark, dir))
    val q = out.writeStream.format("memory").queryName("fstream_us")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("fstream_us")
      .select(col("hour").cast("string"), col("event_type"), col("n"),
        col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    val batch = raw
      .groupBy(date_trunc("hour", col("ts").cast("timestamp")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("hour").cast("string"), col("event_type"), col("n"),
        col("sum_value"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got === batch)
    // 400 minute-spaced events span 7 hour windows × 2 event types
    assert(got.size === 14)
  }

  test("incremental populate: streamed anti-join merge equals batch " +
    "distinct; one Action row per landing batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = tmpDir("incpop")
    val ctx = new graft.core.SourceContext(spark, wh, "inc")
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS().toDF("id", "name")
    val query = IncrementalPopulate.run(stream, ctx, "inc", "entries",
      keyCols = Seq("id"), checkpoint = s"$wh/_ckpt")
    try {
      // three micro-batches with overlapping keys and an in-batch dup
      mem.addData((1L, "a"), (2L, "b"), (2L, "b"))
      query.processAllAvailable()
      mem.addData((2L, "b2"), (3L, "c")) // 2 already landed: first wins
      query.processAllAvailable()
      mem.addData((1L, "a"), (2L, "b")) // fully stale batch: no-op
      query.processAllAvailable()
      val got = ctx.read("entries").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "a"), (2L, "b"), (3L, "c")))
      // stream result == one-shot batch merge of the union
      val wh2 = tmpDir("incpop_batch")
      val ctx2 = new graft.core.SourceContext(spark, wh2, "inc")
      IncrementalPopulate.mergeBatch(ctx2, "inc", "entries", Seq("id"),
        Seq((1L, "a"), (2L, "b"), (2L, "b"), (2L, "b2"), (3L, "c"),
          (1L, "a")).toDF("id", "name"))
      val batchGot = ctx2.read("entries").as[(Long, String)].collect().toSet
      // batch dedup keeps ONE row per key; values agree on the kept keys
      assert(batchGot.map(_._1) === got.map(_._1))
      // provenance: batches 1 and 2 landed rows -> 2 populate actions;
      // batch 3 was a no-op
      val acts = ctx.actions.ls()
        .filter(col("resource") === "inc").collect()
      assert(acts.length === 2)
      assert(acts.forall(_.getAs[String]("action") === "populate"))
      // null-keyed rows are dropped, not re-appended every batch
      val wh3 = tmpDir("incpop_nullkey")
      val ctx3 = new graft.core.SourceContext(spark, wh3, "inc")
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("id", LongType),
        StructField("name", StringType)))
      val withNull = spark.createDataFrame(
        java.util.Arrays.asList(Row(7L, "x"), Row(null, "ghost")), schema)
      IncrementalPopulate.mergeBatch(ctx3, "inc", "entries", Seq("id"),
        withNull)
      IncrementalPopulate.mergeBatch(ctx3, "inc", "entries", Seq("id"),
        withNull)
      assert(ctx3.read("entries").count() === 1)
    } finally query.stop()
  }

  test("bucketed merge target: anti-join never shuffles the existing-keys " +
    "side (the 100 TB side)") {
    val wh = tmpDir("incpop_bkt")
    val ctx = new graft.core.SourceContext(spark, wh, "incb")
    spark.sql(s"DROP TABLE IF EXISTS ${ctx.catalogName("entries")}")
    val b1 = (1L to 200L).map(i => (i, s"n$i")).toDF("id", "name")
    assert(IncrementalPopulate.mergeBatch(ctx, "incb", "entries", Seq("id"),
      b1, buckets = 4) === 200L)
    val b2 = (150L to 300L).map(i => (i, s"n$i")).toDF("id", "name")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // no broadcast (pin the sort-merge shape a 100 TB target gets) and
      // no AQE (so the executed plan's exchanges are directly collectable)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val fresh = IncrementalPopulate.freshRows(ctx, "entries", Seq("id"),
        b2, buckets = 4)
      fresh.collect()
      val plan = fresh.queryExecution.executedPlan
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      assert(scans.nonEmpty, s"expected a file scan of the target:\n$plan")
      // the bucketed scan must expose hash partitioning on the merge key...
      assert(scans.exists(_.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]),
        s"target scan does not expose bucketing:\n$plan")
      // ...and the only shuffle in the whole merge plan is the BATCH side's
      // dedup — nothing re-shuffles the existing keys
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(shuffles.size <= 1,
        s"expected at most the batch-side shuffle, got ${shuffles.size}:\n$plan")
      assert(shuffles.forall(!_.toString.contains("parquet")),
        s"a shuffle reads the existing target:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // result parity: overlapping batch lands only the 100 new keys, and the
    // table stays readable as plain parquet
    assert(IncrementalPopulate.mergeBatch(ctx, "incb", "entries", Seq("id"),
      b2, buckets = 4) === 100L)
    assert(ctx.read("entries").count() === 300L)
    // idempotent replay (stream recovery): fully-stale batch is a no-op
    assert(IncrementalPopulate.mergeBatch(ctx, "incb", "entries", Seq("id"),
      b2, buckets = 4) === 0L)
  }

  test("native kernels run unchanged in streaming plans and agree with " +
    "batch (fingerprint / langId / simhash / shingle hashes)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.ops.{Dedup, TextAnalysis}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "der Hund und die Katze ist da"),
      (3L, ""))
    def analyzed(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.langId(col("text")).as("lang"),
      Dedup.simHash(TextAnalysis.wordShingleHashes(col("text"), 2)).as("sh"),
      size(TextAnalysis.wordShingleHashes(col("text"), 2)).as("n_shingles"))
    val mem = MemoryStream[(Long, String)]
    val query = analyzed(mem.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("kernels")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      query.processAllAvailable()
      val stream = spark.table("kernels").collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val batch = analyzed(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(stream === batch)
      assert(stream(1L)(1) === "en" && stream(2L)(1) === "de")
    } finally query.stop()
  }

  test("stateful operators run unchanged on the RocksDB state store " +
    "(production provider — disk-spilling, not memory-resident)") {
    // same conf GraftSession.withRocksDbState sets at build time, scoped
    // to a child session here (the provider is read at query start)
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = scoped.sqlContext
    import scoped.implicits._
    val mem = MemoryStream[Event]
    val query = EventStreams.sessionizeStream(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("rocks_sessions")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      query.processAllAvailable()
      val closed = scoped.table("rocks_sessions").as[Session].collect()
        .sortBy(_.user_id)
      assert(closed.toSeq === Seq(
        Session(100L, ts(0), 2L, 3.0), Session(200L, ts(5), 1L, 8.0)))
      // the state operator really ran on RocksDB, not the HDFS default
      val metrics = query.lastProgress.stateOperators
        .flatMap(_.customMetrics.keySet().toArray(Array.empty[String]))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb state metrics: ${metrics.mkString(",")}")
    } finally query.stop()
  }

  test("streaming windowed counts with watermark (complete mode)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = EventStreams.windowedCounts(mem.toDS().toDF())
      .writeStream.format("memory").queryName("wcounts")
      .outputMode("complete").start()
    try {
      mem.addData(events: _*)
      query.processAllAvailable()
      val rows = spark.table("wcounts")
        .select("event_type", "n").as[(String, Long)].collect().toMap
      assert(rows === Map("click" -> 3L, "view" -> 1L))
    } finally query.stop()
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  import graft.ops.Multimodal

  private val docs = Seq(
    (1L, "the quick brown fox", "imgsrc"),
    (2L, "a" * 600, "audiosrc"))
    .toDF("doc_id", "text", "source")

  test("binary content + typed metadata (byte length, digests, sniff)") {
    val m = Multimodal.metadata(Multimodal.withBinaryContent(docs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[String]("mime") === "application/x-imgsrc")
    assert(m(1L).getAs[Int]("n_bytes") === 19)
    assert(m(1L).getAs[String]("sniffed") === "t-class")
    assert(m(2L).getAs[String]("sniffed") === "a-class")
    assert(m(1L).getAs[String]("content_md5").matches("[0-9a-f]{32}"))
  }

  test("frame sampling: chunk count capped, per-frame sizes") {
    val f = Multimodal.frameSample(Multimodal.withBinaryContent(docs),
      frameBytes = 256, maxFrames = 4)
    val byDoc = f.groupBy("doc_id").agg(
      count(lit(1)).as("n"), sum("frame_bytes").as("b"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byDoc(1L) === ((1L, 19L)))
    assert(byDoc(2L) === ((3L, 600L))) // 600 bytes -> 256+256+88
  }

  test("decodeFeatures: batched mapPartitions stub with declared schema") {
    val feats = Multimodal.decodeFeatures(Multimodal.withBinaryContent(docs))
      .as[(Long, Array[Double])].collect().toMap
    assert(feats(1L).toSeq === Seq(19.0, 't'.toDouble, 'x'.toDouble, 3.0))
    assert(feats(2L).toSeq === Seq(600.0, 97.0, 97.0, 0.0))
  }

  test("resize stub recomputes metadata on truncated payload") {
    val r = Multimodal.resizeStub(Multimodal.withBinaryContent(docs), 100)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Int]("n_bytes"))
      .toMap
    assert(r === Map(1L -> 19, 2L -> 100))
  }

  test("parsePpm: golden literal P6 bytes decode to known pixel stats") {
    // hand-written 2x1 image, raster (10,20,30),(40,50,60) — pins the
    // parser against the real format independently of ppmEncode
    val golden = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    assert(Multimodal.parsePpm(golden) === ((2, 1, 50L, 70L, 90L)))
    // comments + CRLF/tab whitespace anywhere in the header grammar
    val commented = ("P6 # trailing\n# full comment line\n\t3\r\n1 " +
      "# width height\n255\n").getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    assert(Multimodal.parsePpm(commented) === ((3, 1, 12L, 15L, 18L)))
    // high bytes must read unsigned
    val high = "P6\n1 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](-1, -128, 0)
    assert(Multimodal.parsePpm(high) === ((1, 1, 255L, 128L, 0L)))
    // malformed inputs fail loudly, not silently
    intercept[IllegalArgumentException](
      Multimodal.parsePpm("P5\n1 1\n255\n".getBytes("US-ASCII") ++
        Array[Byte](0)))
    intercept[IllegalArgumentException](
      Multimodal.parsePpm("P6\n2 2\n255\n".getBytes("US-ASCII") ++
        Array[Byte](1, 2, 3)))
    // hostile headers whose w*h*3 overflows Int must reject as truncated,
    // not pass the length check (wrap to small/zero) and walk off the
    // raster or "decode" an empty one
    for (dims <- Seq("477218600 3", "65536 65536")) {
      val e = intercept[Multimodal.PpmException](Multimodal.parsePpm(
        s"P6\n$dims\n255\n".getBytes("US-ASCII") ++ new Array[Byte](104)))
      assert(e.code === "truncated", s"dims $dims: ${e.code}")
    }
  }

  test("resizePpm preserves the source maxval (raw samples are copied, " +
    "so re-labelling as 255 would rescale channel meaning)") {
    // 2x2 maxval-100 image; factor 2 keeps pixel (0,0) only
    val blob = "P6\n2 2\n100\n".getBytes("US-ASCII") ++
      Array[Byte](100, 50, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9)
    val resized = Multimodal.resizePpm(
      Seq((1L, blob)).toDF("doc_id", "content"), factor = 2)
      .as[(Long, Array[Byte])].collect().head._2
    assert(new String(resized.take(11), "US-ASCII") === "P6\n1 1\n100\n")
    assert(resized.takeRight(3).toSeq === Seq[Byte](100, 50, 0))
  }

  test("decodeFeatures magic-byte dispatch: P6 blobs route through the " +
    "real codec, other payloads keep the byte-stat fallback") {
    val mixed = Multimodal.ppmEncode(docs.filter(col("doc_id") === 1))
      .unionByName(Multimodal.withBinaryContent(
        docs.filter(col("doc_id") === 2)).select("doc_id", "content"))
    val feats = Multimodal.decodeFeatures(mixed)
      .as[(Long, Array[Double])].collect().toMap
    // doc 1 is a real P6 blob: w=4+1%5=5, h=3+1%4=4, all-channel pixel sum
    val (w, h) = (5, 4)
    val sumAll = (0 until w * h)
      .flatMap(k => Seq(0, 53, 106).map(c => (31 + k * 7 + c) % 256)).sum
    assert(feats(1L).toSeq === Seq(5.0, 4.0, sumAll.toDouble, 20.0))
    // doc 2 is utf-8 text: the stub's [n_bytes, first, last, n_spaces]
    assert(feats(2L).toSeq === Seq(600.0, 97.0, 97.0, 0.0))
  }

  test("decodePpm side-outputs corrupt blobs with stable reason codes " +
    "instead of failing the job") {
    val blobs = Multimodal.ppmEncode(docs) // ids 1, 2
    val corrupted = blobs.withColumn("content",
      when(col("doc_id") === 1L,
        concat(lit("X".getBytes("US-ASCII")),
          col("content").substr(lit(2), length(col("content")))))
        .otherwise(col("content").substr(lit(1),
          length(col("content")) - 10)))
    val rejects = Multimodal.decodePpmRejects(corrupted)
      .as[(Long, String)].collect().toMap
    assert(rejects === Map(1L -> "bad_magic", 2L -> "truncated"))
    // the stats face of the same frame emits nothing (all rows corrupt) …
    assert(Multimodal.decodePpm(corrupted).count() === 0L)
    // … and clean rows still decode alongside rejects
    val half = blobs.withColumn("content",
      when(col("doc_id") === 1L, col("content").substr(lit(1),
        length(col("content")) - 10)).otherwise(col("content")))
    assert(Multimodal.decodePpm(half).select("doc_id")
      .as[Long].collect().toSeq === Seq(2L))
    assert(Multimodal.decodePpmRejects(half).as[(Long, String)]
      .collect().toSeq === Seq((1L, "truncated")))
  }

  test("resizePpm: nearest-neighbor 2x subsample re-encodes valid P6 " +
    "whose decode matches the kept-pixel arithmetic") {
    val resized = Multimodal.decodePpm(
      Multimodal.resizePpm(Multimodal.ppmEncode(docs), factor = 2))
      .as[(Long, Int, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for (d <- Seq(1L, 2L)) {
      val w = 4 + (d % 5).toInt; val h = 3 + (d % 4).toInt
      val kept = for {
        row <- 0 until h if row % 2 == 0
        colI <- 0 until w if colI % 2 == 0
      } yield row * w + colI
      def ch(c: Int) = kept.map(k => (d * 31 + k * 7 + c * 53) % 256).sum
      assert(resized(d) ===
        ((d, (w + 1) / 2, (h + 1) / 2, ch(0), ch(1), ch(2))))
    }
    // a corrupt blob is skipped by resize (no job failure, no output row)
    val corrupt = Multimodal.ppmEncode(docs).withColumn("content",
      when(col("doc_id") === 1L, lit("junk".getBytes("US-ASCII")))
        .otherwise(col("content")))
    assert(Multimodal.resizePpm(corrupt, 2).select("doc_id")
      .as[Long].collect().toSeq === Seq(2L))
  }

  test("ppmEncode -> decodePpm roundtrip matches the closed-form stats") {
    val stats = Multimodal.decodePpm(Multimodal.ppmEncode(docs))
      .as[(Long, Int, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for (d <- Seq(1L, 2L)) {
      val w = 4 + (d % 5).toInt; val h = 3 + (d % 4).toInt
      val expR = (0 until w * h).map(k => (d * 31 + k * 7) % 256).sum
      val expG = (0 until w * h).map(k => (d * 31 + k * 7 + 53) % 256).sum
      val expB = (0 until w * h).map(k => (d * 31 + k * 7 + 106) % 256).sum
      assert(stats(d) === ((d, w, h, expR, expG, expB)))
    }
  }
}
