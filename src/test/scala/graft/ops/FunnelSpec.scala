package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "buy")

  test("stage chain needs strictly increasing timestamps") {
    val ev = Seq(
      // u1 converts fully: view(1) → click(5) → buy(9)
      (1L, 1L, "view"), (1L, 5L, "click"), (1L, 9L, "buy"),
      // u2 clicks BEFORE viewing: click never chains
      (2L, 5L, "click"), (2L, 9L, "view"),
      // u3: click at the SAME ts as view — strict > rejects the chain
      (3L, 4L, "view"), (3L, 4L, "click"),
      // u4: only noise event types
      (4L, 1L, "scroll"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.reach(ev, stages, tsCol = "ts")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (1, "view", 3L), // u1, u2, u3 all view
      (2, "click", 1L), // only u1 chains
      (3, "buy", 1L)))
  }

  test("earliest admissible chain: a later stage-1 event never helps") {
    // view(10) → click(5)? no. But view(1) exists, so click(5) chains.
    val ev = Seq((1L, 10L, "view"), (1L, 1L, "view"), (1L, 5L, "click"))
      .toDF("user_id", "ts", "event_type")
    val per = Funnel.perUserReach(ev, Seq("view", "click"))
    val reach = per.select("reach_ts").collect().head.getSeq[Long](0)
    assert(reach === Seq(1L, 5L))
  }

  test("per-user depth and reach timestamps") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"),
      (2L, 7L, "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.perUserReach(ev, stages)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got === Map(1L -> 2, 2L -> 1))
  }

  test("matches a brute-force chain reference on a random corpus") {
    val rnd = new scala.util.Random(17)
    val types = Seq("view", "click", "buy", "noise")
    val ev = (1 to 500).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextInt(300).toLong, types(rnd.nextInt(types.size))))
    // reference: greedy earliest chain with strict >
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      var last = Long.MinValue
      var depth = 0
      var advancing = true
      while (advancing && depth < stages.size) {
        val nxt = rows.filter(r => r._3 == stages(depth) && r._2 > last)
          .map(_._2).sorted.headOption
        nxt match {
          case Some(t) => last = t; depth += 1
          case None => advancing = false
        }
      }
      u -> depth
    }
    val got = Funnel.perUserReach(
      ev.toDF("user_id", "ts", "event_type"), stages)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    want.filter(_._2 > 0).foreach { case (u, d) =>
      assert(got(u) === d, s"user $u")
    }
    // users whose only events are noise are absent from the output
    assert(got.keySet === want.filter(_._2 > 0).keySet ++
      ev.filter(e => stages.contains(e._3)).map(_._1).toSet)
  }

  test("transitionLags: exact integer lag stats per adjacent stage pair") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val ev = Seq(
      // u1: view@1000 -> click@3000 -> buy@3500
      (1L, ts(1000), "view"), (1L, ts(3000), "click"), (1L, ts(3500), "buy"),
      // u2: view@0 -> click@10000, never buys
      (2L, ts(0), "view"), (2L, ts(10000), "click"),
      // u3: only views
      (3L, ts(42), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.transitionLags(ev, stages)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(
      "view->click" -> ((2L, 12000000L, 2000000L, 10000000L)),
      "click->buy" -> ((1L, 500000L, 500000L, 500000L))))
  }

  test("reach emits zero-count rows for unreached stages") {
    val ev = Seq((1L, 1L, "view"), (2L, 2L, "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.reach(ev, stages)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1, "view", 2L), (2, "click", 0L), (3, "buy", 0L)))
  }

  test("transitionLags emits n = 0 / NULL-stat rows for zero-converter " +
    "transitions") {
    import java.sql.Timestamp
    val ev = Seq((1L, new Timestamp(1000L), "view"),
      (1L, new Timestamp(2000L), "click"))
      .toDF("user_id", "ts", "event_type")
    val byName = Funnel.transitionLags(ev, stages)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byName.keySet === Set("view->click", "click->buy"))
    assert(byName("view->click").getLong(1) === 1L)
    val cb = byName("click->buy")
    assert(cb.getLong(1) === 0L)
    assert(cb.isNullAt(2) && cb.isNullAt(3) && cb.isNullAt(4))
  }

  test("transitionLags NTZ lags are session-timezone independent " +
    "(DST-spanning wall-clock difference)") {
    // US spring-forward 2026-03-08: 01:30 -> 03:30 wall clock is a 2 h
    // NTZ lag; a session-timezone round-trip would measure 1 h of
    // instants in America/New_York
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ev = Seq(
        (1L, java.time.LocalDateTime.of(2026, 3, 8, 1, 30), "view"),
        (1L, java.time.LocalDateTime.of(2026, 3, 8, 3, 30), "click"))
        .toDF("user_id", "ts", "event_type")
      assert(ev.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampNTZType)
      val got = Funnel.transitionLags(ev, Seq("view", "click"))
        .collect().head
      assert(got.getLong(2) === 2L * 3600L * 1000000L)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("transitionLags rejects non-timestamp ts columns") {
    val ev = Seq((1L, 5L, "view")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.transitionLags(ev, stages)
    }
  }

  test("transitionCounts: adjacent pairs per key, tie-broken by event id") {
    val ev = Seq(
      // u1 in ts order: view → click → view (two transitions)
      (1L, 1L, 10L, "view"), (2L, 2L, 10L, "click"), (3L, 3L, 10L, "view"),
      // u2: two events at the SAME ts — event_id orders them
      (5L, 7L, 20L, "buy"), (4L, 7L, 20L, "click"),
      // u3: single event → no transition
      (6L, 1L, 30L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Funnel.transitionCounts(ev)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("view", "click") -> ((1L, 1L)),
      // "click" fans out to view (u1) and buy (u2) → from_total 2
      ("click", "view") -> ((1L, 2L)),
      // u2: id 4 (click) precedes id 5 (buy) at the shared ts
      ("click", "buy") -> ((1L, 2L))))
  }

  test("transitionCounts: from_total sums the row's outgoing counts") {
    val ev = Seq(
      (1L, 1L, 1L, "a"), (2L, 2L, 1L, "b"),
      (3L, 1L, 2L, "a"), (4L, 2L, 2L, "c"),
      (5L, 1L, 3L, "a"), (6L, 2L, 3L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = Funnel.transitionCounts(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == Set(("a", "b", 2L, 3L), ("a", "c", 1L, 3L)))
  }

  test("maxEventsPerKey: a bot-sized key routes to the reject side " +
    "with a stable reason; everyone else is untouched") {
    // u1 converts normally (3 stage events); u99 is the bot — 500 stage
    // events that would all land in one collect_list buffer
    val normal = Seq((1L, 1L, "view"), (1L, 5L, "click"), (1L, 9L, "buy"))
    val bot = (0 until 500).map(i =>
      (99L, i.toLong, stages(i % stages.size)))
    val noise = Seq((2L, 3L, "scroll")) // non-stage rows never count
    val ev = (normal ++ bot ++ noise).toDF("user_id", "ts", "event_type")
    val accepted = Funnel.perUserReach(ev, stages, maxEventsPerKey = 100)
      .select("user_id").as[Long].collect().toSet
    assert(accepted == Set(1L)) // bot pruned BEFORE the collect
    val rejected = Funnel.rejectedKeys(ev, stages, maxEventsPerKey = 100)
      .as[(Long, Long, String)].collect()
    assert(rejected.toSeq == Seq((99L, 500L, "events_per_key_cap")))
    // default cap: plan unchanged, bot processed as before
    assert(Funnel.perUserReach(ev, stages)
      .select("user_id").as[Long].collect().toSet == Set(1L, 99L))
    // the batch sessionizer honors the same cap
    val sev = (normal ++ bot).map { case (u, t, _) =>
      (u, new java.sql.Timestamp(t * 60000L), 1.0)
    }.toDF("user_id", "ts", "value")
    val sGot = graft.streaming.EventStreams
      .sessionizeBatch(sev, gapMinutes = 30, maxEventsPerKey = 100)
      .select("user_id").distinct().as[Long].collect().toSet
    assert(sGot == Set(1L))
  }

  test("funnel counts are monotonically non-increasing") {
    val rnd = new scala.util.Random(23)
    val types = Seq("view", "click", "buy")
    val ev = (1 to 400).map(_ => (rnd.nextInt(30).toLong,
      rnd.nextInt(200).toLong, types(rnd.nextInt(types.size))))
      .toDF("user_id", "ts", "event_type")
    val counts = Funnel.reach(ev, stages)
      .orderBy("stage").collect().map(_.getLong(2))
    counts.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ => ()
    }
  }
}
