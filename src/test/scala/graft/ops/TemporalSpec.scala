package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.max

import graft.SparkSpec

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("resampleFfill: grid alignment, inclusive fill, between-lines " +
    "key contributes nothing") {
    val obs = Seq(
      (1L, 95L, "a"), (1L, 100L, "b"), (1L, 130L, "c"), (1L, 247L, "d"),
      (2L, 105L, "x"), // lone obs strictly between grid lines: no rows
      (3L, 100L, "y")) // exactly on a grid line: one row
      .toDF("k", "ts", "v")
    val got = Temporal.resampleFfill(obs, Seq("k"), "ts", 100L)
      .select("k", "grid_ts", "r_v").as[(Long, Long, String)]
      .collect().toSet
    assert(got === Set(
      (1L, 100L, "b"), // latest at or before 100 (inclusive beats 95's a)
      (1L, 200L, "c"), // 247 is future; 130 fills forward
      (3L, 100L, "y")))
    intercept[IllegalArgumentException] {
      Temporal.resampleFfill(
        Seq((1L, new java.sql.Timestamp(0L))).toDF("k", "ts"),
        Seq("k"), "ts", 100L)
    }
  }

  test("resampleInterp: exact endpoints, straight-line interior, " +
    "off-grid trailing obs and between-lines keys contribute nothing") {
    val obs = Seq(
      (1L, 100L, 10L), (1L, 300L, 30L), // on-grid endpoints
      (2L, 100L, 10L), (2L, 250L, 40L), // off-grid trailing obs
      (3L, 105L, 5L),                   // lone, between grid lines
      (4L, 200L, 7L))                   // lone, exactly on a grid line
      .toDF("k", "ts", "v")
    val got = Temporal.resampleInterp(obs, Seq("k"), "ts", "v", 100L)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 100L, 10.0), // segment start: (nv-pv)*0/dt is exactly 0
      (1L, 200L, 20.0), // halfway along 10 -> 30
      (1L, 300L, 30.0), // trailing obs on the grid contributes itself
      (2L, 100L, 10.0),
      (2L, 200L, 30.0), // 10 + 30*(100/150)
      (4L, 200L, 7.0)))
    intercept[IllegalArgumentException] { // fractional values refused
      Temporal.resampleInterp(Seq((1L, 100L, 1.5)).toDF("k", "ts", "v"),
        Seq("k"), "ts", "v", 100L)
    }
    intercept[IllegalArgumentException] { // non-integral ts refused
      Temporal.resampleInterp(
        Seq((1L, new java.sql.Timestamp(0L), 1L)).toDF("k", "ts", "v"),
        Seq("k"), "ts", "v", 100L)
    }
  }

  test("resampleInterp at production magnitudes: the (nv-pv)·(g-pt) " +
    "product runs in decimal, not long — no silent wrap past 2^63") {
    // value delta 2e9 over a day-long µs segment: the long product at
    // the midpoint is 2e9 · 43.2e9 = 8.64e19 > Long.MaxValue and would
    // wrap to a wrong interp under non-ANSI long arithmetic
    val day = 86400000000L
    val obs = Seq((1L, 0L, 0L), (1L, day, 2000000000L))
      .toDF("k", "ts", "v")
    val got = Temporal.resampleInterp(obs, Seq("k"), "ts", "v", day / 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 0L, 0.0),
      (1L, day / 2, 1.0e9), // exact midpoint — wrapped long gives garbage
      (1L, day, 2.0e9)))
  }

  test("resampleInterp matches a brute-force reference on a random " +
    "corpus, pre-epoch timestamps included") {
    val rnd = new scala.util.Random(47)
    val obs = (1 to 400).map { _ =>
      (rnd.nextInt(6).toLong, rnd.nextInt(2000).toLong - 1000L,
        rnd.nextInt(1000).toLong)
    }.distinct.groupBy(r => (r._1, r._2))
      .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
    val got = Temporal.resampleInterp(obs.toDF("k", "ts", "v"),
      Seq("k"), "ts", "v", 70L).as[(Long, Long, Double)].collect().toSet
    val want = obs.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val g0 = math.floorDiv(sorted.head._1 + 69L, 70L) * 70L
      (g0 to sorted.last._1 by 70L).map { g =>
        val (pt, pv) = sorted.filter(_._1 <= g).last
        val (nt, nv) = sorted.filter(_._1 >= g).head
        val v = if (nt == pt) pv.toDouble
          else pv.toDouble + ((nv - pv) * (g - pt)).toDouble /
            (nt - pt).toDouble
        (k, g, v)
      }
    }.toSet
    assert(got === want)
  }

  test("asOfJoinBroadcast equals asOfJoin across the whole mode matrix " +
    "on a random corpus") {
    val rnd = new scala.util.Random(41)
    val l = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "obs_id")
    val r = (1 to 150).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, 1000L + i))
      .toDF("k", "ts", "state_id")
      .groupBy("k", "ts").agg(max("state_id").as("state_id"))
    for (fwd <- Seq(false, true); strict <- Seq(false, true);
         tol <- Seq(None, Option(50L))) {
      val a = Temporal.asOfJoin(l, r, Seq("k"),
        tolerance = tol, forward = fwd, strict = strict)
        .collect().toSet
      val b = Temporal.asOfJoinBroadcast(l, r, Seq("k"),
        tolerance = tol, forward = fwd, strict = strict)
        .collect().toSet
      assert(a === b, s"forward=$fwd strict=$strict tol=$tol")
    }
  }

  test("asOfJoinBroadcast: a NULL left ts matches nothing; an unknown " +
    "key keeps NULL payloads") {
    val l = Seq((Some(1L), Some(10L), "a"), (Some(1L), None, "b"),
      (Some(9L), Some(10L), "c")).toDF("k", "ts", "obs")
    val r = Seq((1L, 5L, 7.0)).toDF("k", "ts", "q")
    val got = Temporal.asOfJoinBroadcast(l, r, Seq("k"))
      .select("obs", "r_q").as[(String, Option[Double])].collect().toSet
    assert(got === Set(("a", Some(7.0)), ("b", None), ("c", None)))
  }

  test("twapBuckets: exact piecewise-constant mass per bucket; trailing " +
    "observation opens no segment") {
    // step 100: [50,150)@10 covers bucket0 for 50µs and bucket1 for 50µs;
    // [150,250)@30 covers bucket1 for 50µs and bucket2 for 50µs; the
    // t=250 observation is trailing state and contributes nothing
    val obs = Seq((1L, 50L, 10L), (1L, 150L, 30L), (1L, 250L, 99L),
      (2L, 100L, 7L), (2L, 200L, 7L)) // exact-boundary segment
      .toDF("k", "ts", "v")
    val got = Temporal.twapBuckets(obs, Seq("k"), "ts", "v", 100L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 0L, 500L, 50L),
      (1L, 100L, 10L * 50 + 30L * 50, 100L),
      (1L, 200L, 30L * 50, 50L),
      (2L, 100L, 7L * 100, 100L))) // boundary-aligned: exactly bucket 1
    intercept[IllegalArgumentException] {
      Temporal.twapBuckets(
        Seq((1L, 1L, 1.5)).toDF("k", "ts", "v"), Seq("k"), "ts", "v", 10L)
    }
  }

  test("resampleFfill and twapBuckets: pre-epoch (negative) timestamps " +
    "use floor-true grid arithmetic") {
    // ceil(-150/100)·100 = -100 — a truncating div would compute 0 and
    // emit no rows at all for this key
    val obs = Seq((1L, -150L, "a"), (1L, -20L, "b")).toDF("k", "ts", "v")
    val got = Temporal.resampleFfill(obs, Seq("k"), "ts", 100L)
      .select("grid_ts", "r_v").as[(Long, String)].collect().toSet
    assert(got === Set((-100L, "a")))
    // segment [-150, -50)@10 spans buckets [-200,-100) and [-100,0),
    // 50 µs each — a truncating div would mis-bucket and emit a
    // NEGATIVE covered duration
    val t = Seq((1L, -150L, 10L), (1L, -50L, 99L)).toDF("k", "ts", "v")
    val tw = Temporal.twapBuckets(t, Seq("k"), "ts", "v", 100L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(tw === Set((1L, -200L, 500L, 50L), (1L, -100L, 500L, 50L)))
  }

  test("asOfJoinNearest rejects non-numeric ts columns (fail-fast " +
    "contract, mirrors transitionLags)") {
    val l = Seq((1L, new java.sql.Timestamp(0L), "x")).toDF("k", "ts", "obs")
    val r = Seq((1L, new java.sql.Timestamp(0L), 1.0)).toDF("k", "ts", "q")
    val e = intercept[IllegalArgumentException] {
      Temporal.asOfJoinNearest(l, r, Seq("k"))
    }
    assert(e.getMessage.contains("NUMERIC"))
  }

  // left observations and right quotes over two keys, numeric (µs-style) ts
  private def L = Seq(
    (1L, 50L, "l-a"), (1L, 10L, "l-b"), (1L, 5L, "l-c"),
    (2L, 100L, "l-d"), (3L, 7L, "l-e"))
    .toDF("k", "ts", "obs")
  private def R = Seq(
    (1L, 10L, 1.0), (1L, 40L, 2.0), (1L, 60L, 3.0),
    (2L, 1L, 4.0))
    .toDF("k", "ts", "quote")

  private def got(df: org.apache.spark.sql.DataFrame): Set[Row] =
    df.collect().toSet

  test("backward as-of: latest right at or before, per key, left-outer") {
    val out = Temporal.asOfJoin(L, R, Seq("k"), rightPrefix = "q_")
      .select("k", "ts", "obs", "q_ts", "q_quote")
    assert(got(out) === Set(
      Row(1L, 50L, "l-a", 40L, 2.0),
      Row(1L, 10L, "l-b", 10L, 1.0), // inclusive: equal ts matches
      Row(1L, 5L, "l-c", null, null), // nothing at or before 5
      Row(2L, 100L, "l-d", 1L, 4.0),
      Row(3L, 7L, "l-e", null, null))) // key absent on the right
  }

  test("forward as-of: earliest right at or after") {
    val out = Temporal.asOfJoin(L, R, Seq("k"), rightPrefix = "q_",
      forward = true).select("k", "ts", "q_ts")
    assert(got(out) === Set(
      Row(1L, 50L, 60L), Row(1L, 10L, 10L), Row(1L, 5L, 10L),
      Row(2L, 100L, null), Row(3L, 7L, null)))
  }

  test("tolerance bounds the match distance") {
    val out = Temporal.asOfJoin(L, R, Seq("k"), rightPrefix = "q_",
      tolerance = Some(10L)).select("k", "ts", "q_ts")
    assert(got(out) === Set(
      Row(1L, 50L, 40L), // |50-40| = 10: inside
      Row(1L, 10L, 10L),
      Row(1L, 5L, null),
      Row(2L, 100L, null), // the match at ts=1 is 99 away: nulled
      Row(3L, 7L, null)))
  }

  test("equal-ts right duplicates resolve deterministically (hash-max), " +
    "independent of partitioning") {
    val dup = Seq((1L, 10L, 1.0), (1L, 10L, 2.0), (1L, 10L, 3.0))
      .toDF("k", "ts", "quote")
    val l = Seq((1L, 20L)).toDF("k", "ts")
    val picks = (1 to 4).map { n =>
      Temporal.asOfJoin(l, dup.repartition(n), Seq("k"), rightPrefix = "q_")
        .select("q_quote").collect().head.getDouble(0)
    }
    assert(picks.distinct.size === 1)
  }

  test("strict mode: an equal-ts right row is not admissible " +
    "(allow_exact_matches=false)") {
    val out = Temporal.asOfJoin(L, R, Seq("k"), rightPrefix = "q_",
      strict = true).select("k", "ts", "q_ts")
    assert(got(out) === Set(
      Row(1L, 50L, 40L), // unchanged: 40 < 50 strictly
      Row(1L, 10L, null), // the ts=10 match is exact: excluded
      Row(1L, 5L, null),
      Row(2L, 100L, 1L),
      Row(3L, 7L, null)))
    val fwd = Temporal.asOfJoin(L, R, Seq("k"), rightPrefix = "q_",
      forward = true, strict = true).select("k", "ts", "q_ts")
    assert(got(fwd) === Set(
      Row(1L, 50L, 60L),
      Row(1L, 10L, 40L), // skips the exact ts=10, takes 40
      Row(1L, 5L, 10L),
      Row(2L, 100L, null),
      Row(3L, 7L, null)))
  }

  test("null left ts matches nothing, in both directions") {
    val l = Seq((Some(1L), Option.empty[Long]), (Some(1L), Some(50L)))
      .toDF("k", "ts")
    for (fwd <- Seq(false, true)) {
      val out = Temporal.asOfJoin(l, R, Seq("k"), rightPrefix = "q_",
        forward = fwd)
      assert(out.filter("ts IS NULL").select("q_ts")
        .collect().head.isNullAt(0))
    }
  }

  test("plan: one exchange on the key, no join operator") {
    val plan = Temporal.asOfJoin(L, R, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"more exchanges than the union+window shape needs:\n$plan")
  }
}

class AsOfNearestSpec extends SparkSpec {
  import spark.implicits._

  private def L = Seq(
    (1L, 50L, "l-a"), (1L, 10L, "l-b"), (1L, 5L, "l-c"),
    (2L, 100L, "l-d"), (3L, 7L, "l-e"))
    .toDF("k", "ts", "obs")
  private def R = Seq(
    (1L, 10L, 1.0), (1L, 40L, 2.0), (1L, 60L, 3.0),
    (2L, 1L, 4.0))
    .toDF("k", "ts", "quote")

  test("nearest picks the closer side; equidistant resolves backward") {
    val out = Temporal.asOfJoinNearest(L, R, Seq("k"), rightPrefix = "q_")
      .select("k", "ts", "q_ts")
    assert(out.collect().toSet === Set(
      Row(1L, 50L, 40L), // back 10 beats forward 10: equidistant → backward
      Row(1L, 10L, 10L), // exact hit
      Row(1L, 5L, 10L), // only forward exists
      Row(2L, 100L, 1L), // only backward exists
      Row(3L, 7L, null))) // key absent on the right
  }

  test("nearest tolerance nulls both directions independently") {
    val out = Temporal.asOfJoinNearest(L, R, Seq("k"), rightPrefix = "q_",
      tolerance = Some(6L)).select("k", "ts", "q_ts")
    assert(out.collect().toSet === Set(
      Row(1L, 50L, null), // 40 is 10 back, 60 is 10 fwd: both out of 6
      Row(1L, 10L, 10L),
      Row(1L, 5L, 10L), // forward 5 inside the tolerance
      Row(2L, 100L, null),
      Row(3L, 7L, null)))
  }

  test("nearest matches merge_asof on a random corpus") {
    val rnd = new scala.util.Random(11)
    val li = (1 to 120).map(i => (i % 5L, rnd.nextInt(1000).toLong, i.toLong))
    val ri = (1 to 80).map(i =>
      (i % 5L, rnd.nextInt(1000).toLong, i.toDouble))
    // reference: per left row, min |Δ|, ties toward the backward side,
    // ties within a side toward... the operator's hash pick — restrict the
    // reference to rows with a UNIQUE nearest candidate to stay exact
    val byKey = ri.groupBy(_._1)
    val want = li.flatMap { case (k, ts, id) =>
      val cands = byKey.getOrElse(k, Seq.empty)
      if (cands.isEmpty) Some((id, None)) else {
        val best = cands.map(c => (math.abs(c._2 - ts), c._2 <= ts, c._2))
        val d = best.map(_._1).min
        val side = best.filter(_._1 == d)
        val pick = if (side.exists(_._2)) side.filter(_._2) else side
        if (pick.map(_._3).distinct.size > 1) None // ambiguous ts: skip
        else Some((id, Some(pick.head._3)))
      }
    }.toMap
    val got = Temporal.asOfJoinNearest(
      li.toDF("k", "ts", "id"), ri.toDF("k", "ts", "v"),
      Seq("k"), rightPrefix = "q_")
      .select("id", "q_ts").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    want.foreach { case (id, exp) =>
      assert(got(id) === exp, s"left row $id")
    }
  }
}

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("intervals compress runs and close at the next change") {
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 5L, "x"))
      .toDF("k", "ts", "state")
    val out = Temporal.scd2(ev, Seq("k"), "ts", "state")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out === Set(
      (1L, "a", 10L, 30L), // the ts=20 repeat extends, not splits
      (1L, "b", 30L, 40L),
      (1L, "a", 40L, -1L), // re-entering a past state opens a NEW interval
      (2L, "x", 5L, -1L)))
  }

  test("null attribute values are tracked states, not dropped rows") {
    val ev = Seq(
      (1L, 10L, Option.empty[String]), (1L, 20L, Some("a")),
      (1L, 30L, Option.empty[String]))
      .toDF("k", "ts", "state")
    val out = Temporal.scd2(ev, Seq("k"), "ts", "state")
    assert(out.count() === 3)
    assert(out.filter("state IS NULL").count() === 2)
  }

  test("intervals tile the key's timeline: no gaps, no overlaps") {
    val rnd = new scala.util.Random(3)
    val ev = (1 to 200).map(i =>
      (i % 7L, rnd.nextInt(10000).toLong, s"s${rnd.nextInt(3)}"))
      .distinct
      .toDF("k", "ts", "state")
    val rows = Temporal.scd2(ev, Seq("k"), "ts", "state")
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
      .groupBy(_._1)
    rows.values.foreach { ivs =>
      val sorted = ivs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(e1 === s2)
        case _ => ()
      }
      assert(sorted.last._3 === Long.MaxValue) // exactly one open interval
    }
  }
}

class RollingSpec extends SparkSpec {
  import spark.implicits._

  test("trailing range frame: count and integer sum, inclusive bounds") {
    val ev = Seq(
      (1L, 10L, 5L), (1L, 15L, 7L), (1L, 30L, 1L), (2L, 10L, 100L))
      .toDF("k", "ts", "v")
    val got = Temporal.rollingSum(ev, Seq("k"), "ts", "v", windowSize = 10L)
      .select("k", "ts", "roll_n", "roll_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 10L, 1L, 5L),
      (1L, 15L, 2L, 12L), // 10 is 5 back: inside the inclusive frame
      (1L, 30L, 1L, 1L), // 15 is 15 back: outside
      (2L, 10L, 1L, 100L)))
  }

  test("matches a brute-force trailing window on a random corpus") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map(i =>
      (i % 4L, rnd.nextInt(500).toLong, rnd.nextInt(100).toLong))
    // brute reference over value-distinct (k, ts): aggregate equal-ts rows
    // first, as any RANGE frame does
    val w = 25L
    val want = rows.map { case (k, ts, _) =>
      val in = rows.filter(r => r._1 == k && r._2 <= ts && r._2 >= ts - w)
      ((k, ts), (in.size.toLong, in.map(_._3).sum))
    }.toMap
    Temporal.rollingSum(rows.toDF("k", "ts", "v"), Seq("k"), "ts", "v", w)
      .select("k", "ts", "roll_n", "roll_sum").collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        assert((r.getLong(2), r.getLong(3)) === want(key), s"at $key")
      }
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("overlap pairs match a brute-force reference, each exactly once, " +
    "across bucket widths") {
    val rnd = new scala.util.Random(7)
    val li = (1 to 60).map { i =>
      val s = rnd.nextInt(500).toLong
      (i.toLong, (i % 3).toLong, s, s + rnd.nextInt(80))
    }
    val ri = (1 to 60).map { i =>
      val s = rnd.nextInt(500).toLong
      (100L + i, (i % 3).toLong, s, s + rnd.nextInt(80))
    }
    val want = (for {
      (lid, k, ls, le) <- li
      (rid, rk, rs, re) <- ri
      if k == rk && ls <= re && rs <= le
    } yield (lid, rid)).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Temporal.rangeJoin(
        li.toDF("id", "k", "s", "e"), ri.toDF("id", "k", "s", "e"),
        Seq("k"), "s", "e", "s", "e", bucketWidth = w)
        .select("id", "r_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at width $w")
      assert(got.toSet === want, s"pair set mismatch at width $w")
    }
  }

  test("no join keys: pure interval overlap") {
    val a = Seq((1L, 0L, 10L), (2L, 20L, 30L)).toDF("id", "s", "e")
    val b = Seq((9L, 10L, 12L), (8L, 31L, 40L)).toDF("id", "s", "e")
    val got = Temporal.rangeJoin(a, b, Seq.empty, "s", "e", "s", "e", 5L)
      .select("id", "r_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 9L))) // closed-interval touch at 10 counts
  }
}

class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: rank-wise 1/(k+r) sums, deterministic tie-break") {
    // list A ranks: x=1, y=2 (tie on score broken by id); list B: y=1
    val a = Seq((7L, "x", 9.0), (7L, "y", 9.0)).toDF("query_id", "id", "score")
    val b = Seq((7L, "y", 0.1)).toDF("query_id", "id", "score")
    val got = TextSearch.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === Set(
      ("x", 1L, 1.0 / 11),
      ("y", 2L, 1.0 / 12 + 1.0 / 11)))
  }

  test("rrfFuse: queries rank independently") {
    val a = Seq((1L, "x", 5.0), (2L, "x", 1.0), (2L, "z", 9.0))
      .toDF("query_id", "id", "score")
    val got = TextSearch.rrfFuse(Seq(a), k = 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
      .toSet
    assert(got === Set((1L, "x", 1.0), (2L, "z", 1.0), (2L, "x", 0.5)))
  }

  test("seasonalProfile: exact integer stats per (key, hour-of-day), " +
    "days fold into one slot") {
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-0$day $h%02d:30:00")
    val ev = Seq(
      ("a", ts(1, 3), 1.5), ("a", ts(2, 3), 2.5), // two DAYS, same hour
      ("a", ts(1, 4), 10.0), ("b", ts(1, 3), 7.0))
      .toDF("event_type", "ts", "value")
    val got = Temporal.seasonalProfile(ev)
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // q = floor(v*1000): 1500, 2500, 10000, 7000
    assert(got == Map(
      ("a", 3) -> ((2L, 4000L, 1500L * 1500 + 2500L * 2500)),
      ("a", 4) -> ((1L, 10000L, 100000000L)),
      ("b", 3) -> ((1L, 7000L, 49000000L))))
    intercept[IllegalArgumentException](
      Temporal.seasonalProfile(ev, scale = 0))
  }

  test("gaps: strictly-over-threshold silences only, per key, " +
    "leading silence out of scope") {
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-05 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, ts(8, 0)), (1L, ts(9, 0)),   // exactly 3600 s — NOT a gap
      (1L, ts(11, 30)),                 // 9000 s — gap
      (1L, ts(11, 45)),                 // 900 s — not
      (2L, ts(0, 0)), (2L, ts(23, 0)))  // other key: its own 82800 s gap
      .toDF("user_id", "ts")
    val got = Temporal.gaps(ev, minGapSeconds = 3600L)
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, ts(9, 0), ts(11, 30), 9000L),
      (2L, ts(0, 0), ts(23, 0), 82800L)))
    // a key's FIRST event has no bounding pair — no phantom gap
    assert(!got.exists(_._4 > 82800L))
    intercept[IllegalArgumentException](Temporal.gaps(ev, 0L))
  }

  test("downsample: OHLC selections per (key, bucket), ties broken by " +
    "the tie column, volume integer-exact; ONE aggregation, no window") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // key A, bucket 0 (0..599): open = first by (ts, tie), and two
      // rows share ts=10 so the tie column decides
      (1L, ts(10), "A", 5.0), (2L, ts(10), "A", 7.0),
      (3L, ts(400), "A", 1.5), (4L, ts(599), "A", 6.25),
      // key A, bucket 600
      (5L, ts(600), "A", 2.0),
      // key B straddles nothing
      (6L, ts(50), "B", 9.0))
      .toDF("event_id", "ts", "event_type", "value")
    val got = Temporal.downsample(ev, bucketSeconds = 600L)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getLong(7)))).toMap
    assert(rows(("A", 0L)) ==
      ((4L, 5.0, 7.0, 1.5, 6.25, (5000L + 7000L + 1500L + 6250L))))
    assert(rows(("A", 600L)) == ((1L, 2.0, 2.0, 2.0, 2.0, 2000L)))
    assert(rows(("B", 0L)) == ((1L, 9.0, 9.0, 9.0, 9.0, 9000L)))
    // plan pin: one hash aggregation, no WindowExec, no Sort
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Temporal.downsample(ev, 600L)
      df.collect()
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"downsample gained a window:\n$plan")
      // struct-ordered min_by/max_by plans SortAggregate, whose
      // per-partition group-key sorts are streaming and spillable —
      // the pin is the shuffle count and the map-side partial split
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size == 1, s"expected exactly one aggregation shuffle:\n$plan")
      assert(plan.toString.contains("partial_"),
        s"expected a map-side partial aggregation:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("ewma: bit-equal to the sequential reference fold per key, in " +
    "(ts, tie) order, across any partitioning") {
    val rnd = new scala.util.Random(1301)
    val rows = (1 to 600).map(i => (i.toLong,
      new java.sql.Timestamp(((i * 37) % 250) * 60000L),
      (i % 7).toLong, rnd.nextInt(1000) / 10.0))
    val got = Temporal.ewma(
      rows.toDF("event_id", "ts", "user_id", "value"), alpha = 0.25,
      keyCol = "user_id")
      .select("event_id", "ewma", "ewvar")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // reference: plain Scala fold in the same (ts, event_id) order
    val expect = rows.groupBy(_._3).flatMap { case (_, evs) =>
      var m = 0.0; var v = 0.0; var seeded = false
      evs.sortBy(e => (e._2.getTime, e._1)).map { e =>
        if (!seeded) { seeded = true; m = e._4; v = 0.0 }
        else {
          val diff = e._4 - m; val incr = 0.25 * diff
          m = m + incr; v = 0.75 * (v + diff * incr)
        }
        e._1 -> ((m, v))
      }
    }
    // BIT equality, not tolerance — the operator's whole contract
    expect.foreach { case (id, mv) => assert(got(id) == mv, s"event $id") }
  }

  test("ewma: null and NaN values are no-evidence rows — null stats, " +
    "state untouched; bad alpha fails fast") {
    val ev = Seq(
      (1L, new java.sql.Timestamp(1000L), 1L, Some(4.0)),
      (2L, new java.sql.Timestamp(2000L), 1L, Option.empty[Double]),
      (3L, new java.sql.Timestamp(3000L), 1L, Some(Double.NaN)),
      (4L, new java.sql.Timestamp(4000L), 1L, Some(8.0)))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Temporal.ewma(ev, alpha = 0.25, keyCol = "user_id")
      .select("event_id", "ewma", "ewvar")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(2L).isEmpty && got(3L).isEmpty)
    assert(got(1L).contains(4.0))
    // event 4 folds against event 1's state, not the null rows
    assert(got(4L).contains(4.0 + 0.25 * 4.0))
    intercept[IllegalArgumentException](Temporal.ewma(ev, alpha = 0.0))
    intercept[IllegalArgumentException](Temporal.ewma(ev, alpha = 1.5))
  }
}
