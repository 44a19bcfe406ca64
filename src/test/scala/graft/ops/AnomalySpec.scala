package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("the pure predicate: constant history flags any deviation, never equality") {
    // history = five 7s: s = 35, ss = 245, cnt = 5, variance 0
    assert(Anomaly.outlier(q = 8, cnt = 5, s = 35, ss = 245, k = 3, minN = 2))
    assert(!Anomaly.outlier(q = 7, cnt = 5, s = 35, ss = 245, k = 3, minN = 2))
  }

  test("the pure predicate: below minN is never an outlier") {
    assert(!Anomaly.outlier(q = 1000, cnt = 1, s = 0, ss = 0, k = 3, minN = 2))
  }

  test("the pure predicate agrees with float z-score off the boundary") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val hist = Seq.fill(2 + rnd.nextInt(20))(rnd.nextInt(1000).toLong)
      val x = rnd.nextInt(2000).toLong - 500
      val cnt = hist.length.toLong
      val s = hist.sum; val ss = hist.map(v => v * v).sum
      val mu = s.toDouble / cnt
      val sigma = math.sqrt(ss.toDouble / cnt - mu * mu)
      val zf = math.abs(x - mu) - 3 * sigma
      // skip razor-edge cases where float rounding decides
      if (math.abs(zf) > 1e-6) {
        assert(Anomaly.outlier(x, cnt, s, ss, k = 3, minN = 2) == (zf > 0),
          s"x=$x hist=$hist")
      }
    }
  }

  test("batch: window is the n strictly preceding events, per key") {
    val ev = Seq(
      // u1: 8 calm events then a spike; the spike must flag, and the
      // event AFTER the spike is judged with the spike in ITS window
      (1L, ts(1), 1L, 10.0), (2L, ts(2), 1L, 11.0), (3L, ts(3), 1L, 10.0),
      (4L, ts(4), 1L, 11.0), (5L, ts(5), 1L, 10.0), (6L, ts(6), 1L, 11.0),
      (7L, ts(7), 1L, 10.0), (8L, ts(8), 1L, 11.0),
      (9L, ts(9), 1L, 500.0),
      // u2: same spike value but only 3 prior events → below minN
      (10L, ts(1), 2L, 10.0), (11L, ts(2), 2L, 11.0), (12L, ts(3), 2L, 10.0),
      (13L, ts(4), 2L, 500.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Anomaly.flagOutliers(ev, n = 20, k = 3, minN = 8)
      .select("event_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(got(9L))
    assert(!got(13L)) // cold start: cnt = 3 < minN
    assert((1L to 8L).forall(id => !got(id)))
  }

  test("null and NaN values are no-evidence rows: never abort, never " +
    "flag, never enter a window (cnt counts evidence only)") {
    val ev = Seq(
      (1L, ts(1), 1L, Some(10.0)), (2L, ts(2), 1L, Some(11.0)),
      (3L, ts(3), 1L, None), // null value mid-history
      (4L, ts(4), 1L, Some(Double.NaN)), // NaN quantizes to null q
      (5L, ts(5), 1L, Some(10.0)), (6L, ts(6), 1L, Some(11.0)),
      (7L, ts(7), 1L, Some(10.0)), (8L, ts(8), 1L, Some(11.0)),
      (9L, ts(9), 1L, Some(10.0)), (10L, ts(10), 1L, Some(11.0)),
      (11L, ts(11), 1L, Some(500.0)))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Anomaly.flagOutliers(ev, n = 20, k = 3, minN = 8)
      .select("event_id", "cnt", "is_outlier")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // no-evidence rows emit zero stats and a non-null false — there is
    // no evidence about them, and they are no evidence
    assert(got(3L) == ((0L, false)) && got(4L) == ((0L, false)))
    // the spike's window counts the 8 real observations, not 10 rows —
    // with count(1) semantics cnt would be 10 and s/ss still 8 rows,
    // biasing dev; with evidence-only windows it flags cleanly at minN = 8
    assert(got(11L) == ((8L, true)))
    // seasonal face: same pass-through (no raise_error on null), flag false
    val prof = Seq((1L, 0, 10L, 105000L, 1102550L))
      .toDF("user_id", "hod", "n", "s", "ss")
    val seas = Anomaly.flagSeasonal(
      Seq((1L, ts(1), 1L, Option.empty[Double])).toDF("user_id", "ts", "event_id", "value"),
      prof, keyCol = "user_id")
      .select("is_outlier").as[Boolean].collect()
    assert(seas.toSeq == Seq(false))
  }

  test("a null row inside a FULL n-row window occupies no frame slot: " +
    "batch equals stream on the evidence rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // n = 4: four calm evidence rows, a null INSIDE the now-full frame,
    // then a spike — with row-slot semantics the null would displace
    // the first calm row from the spike's frame (cnt = 3); with
    // evidence-only windows the spike sees all four (cnt = 4)
    val rows = Seq(
      (1L, ts(1), 1L, Some(10.0)), (2L, ts(2), 1L, Some(11.0)),
      (3L, ts(3), 1L, Some(10.0)), (4L, ts(4), 1L, Some(11.0)),
      (5L, ts(5), 1L, Option.empty[Double]),
      (6L, ts(6), 1L, Some(500.0)))
    val batch = Anomaly.flagOutliers(
      rows.toDF("event_id", "ts", "user_id", "value"), n = 4, minN = 2)
    val byId = batch.select("event_id", "cnt", "is_outlier")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(byId(6L) == ((6L, 4L, true)), "spike must see all 4 evidence rows")
    assert(byId(5L) == ((5L, 0L, false)))
    val batchEvidence = batch
      .filter(col("q").isNotNull)
      .select("user_id", "event_id", "q", "cnt", "s", "ss", "is_outlier")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Option[Double])]
    val out = graft.streaming.AnomalyStream.flagOutliersStream(
      mem.toDS().toDF("event_id", "ts", "user_id", "value"), n = 4, minN = 2)
    val q = out.writeStream.format("memory").queryName("anom_null_face")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*); q.processAllAvailable()
      mem.addData((-1L, ts(1000000L), -1L, Some(0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("anom_null_face")
      .filter(col("user_id") =!= -1L)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(streamed == batchEvidence)
  }

  test("batch: same-timestamp events order by the tie column") {
    val ev = Seq(
      (1L, ts(1), 1L, 10.0), (2L, ts(1), 1L, 10.0), (3L, ts(1), 1L, 99.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Anomaly.flagOutliers(ev, n = 20, k = 3, minN = 2)
      .select("event_id", "cnt").as[(Long, Long)].collect().toMap
    // deterministic (ts, event_id) order → cnt = 0, 1, 2
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("streaming face equals the batch face on a multi-batch feed") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { i =>
      val base = 50 + rnd.nextInt(10)
      val v = if (i % 37 == 0) base * 20.0 else base.toDouble
      (i.toLong, ts(i * 60L), (i % 5).toLong, v)
    }
    val batch = Anomaly.flagOutliers(
      rows.toDF("event_id", "ts", "user_id", "value"))
      .select("user_id", "event_id", "q", "cnt", "s", "ss", "is_outlier")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet

    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val out = graft.streaming.AnomalyStream.flagOutliersStream(
      mem.toDS().toDF("event_id", "ts", "user_id", "value"))
    val q = out.writeStream.format("memory").queryName("anom_face")
      .outputMode("append").start()
    try {
      // three time-ordered batches at common cuts, then the sentinel
      val (a, rest) = rows.splitAt(100)
      val (b, c) = rest.splitAt(100)
      Seq(a, b, c).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      mem.addData((-1L, ts(1000000L), -1L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("anom_face")
      .filter(col("user_id") =!= -1L)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(streamed == batch)
  }

  test("bad params fail fast") {
    val ev = Seq((1L, ts(1), 1L, 1.0)).toDF("event_id", "ts", "user_id", "value")
    intercept[IllegalArgumentException](Anomaly.flagOutliers(ev, n = 0))
    intercept[IllegalArgumentException](Anomaly.flagOutliers(ev, minN = 1))
    intercept[IllegalArgumentException](Anomaly.flagOutliers(ev, scale = 0))
  }

  test("the BIGINT overflow bound is ENFORCED: an out-of-range value " +
    "raises instead of wrapping the sigma test") {
    // qLimit(n=20, k=3) = 3e9/60 = 5e7; value 1e5 at scale 1000 → q = 1e8
    val ev = Seq(
      (1L, ts(1), 1L, 10.0),
      (2L, ts(2), 1L, 100000.0)).toDF("event_id", "ts", "user_id", "value")
    val e = intercept[Exception](Anomaly.flagOutliers(ev).collect())
    assert(e.getMessage.contains("overflow bound"), e.getMessage)
    // in-range values still flow (the guard is a tripwire, not a filter)
    val ok = Anomaly.flagOutliers(
      Seq((1L, ts(1), 1L, 10.0), (2L, ts(2), 1L, 20.0))
        .toDF("event_id", "ts", "user_id", "value")).collect()
    assert(ok.length == 2)
  }

  test("flagSeasonal: events judged against their (key, hour) baseline " +
    "— hour-local outliers flagged, globally-odd-but-hour-normal not") {
    def at(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-${10 + day}%02d $hour%02d:30:00")
    // type "a", hour 3: ten days of ~5.0 plus one 50.0 spike;
    // hour 9: ten days of ~50.0 (so 50 is NORMAL for hour 9)
    val rows =
      (0 until 10).map(d => (100L + d, at(d, 3), "a", 5.0 + 0.01 * d)) ++
      (0 until 10).map(d => (200L + d, at(d, 9), "a", 50.0 + 0.01 * d)) ++
      Seq((999L, at(10, 3), "a", 50.0), // spike in the quiet hour
        (998L, at(10, 9), "a", 50.05))  // same magnitude, busy hour: fine
    val ev = rows.toDF("event_id", "ts", "event_type", "value")
    val prof = Temporal.seasonalProfile(ev)
    val got = Anomaly.flagSeasonal(ev, prof, minN = 8)
      .select("event_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(got(999L), "hour-3 spike must flag against the hour-3 baseline")
    assert(!got(998L), "a hour-9-normal value must not flag")
    assert((0 until 10).forall(d => !got(100L + d) && !got(200L + d)))
  }

  test("flagSeasonal: unprofiled (key, hour) and below-minN hours emit " +
    "is_outlier = false with zeroed moments — the cold-start contract") {
    val hist = (0 until 10).map(d =>
      (1L + d, java.sql.Timestamp.valueOf(f"2024-03-${10 + d}%02d 03:00:00"),
        "a", 5.0))
    val ev = (hist ++ Seq(
      (90L, java.sql.Timestamp.valueOf("2024-03-21 07:00:00"), "a", 900.0)))
      .toDF("event_id", "ts", "event_type", "value")
    // profile from HISTORY ONLY — hour 7 never profiled
    val prof = Temporal.seasonalProfile(hist.toDF(
      "event_id", "ts", "event_type", "value"))
    val got = Anomaly.flagSeasonal(ev, prof)
      .select("event_id", "n", "is_outlier")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(90L) == ((0L, false)))
    // below minN: same data, minN > history size
    val few = Anomaly.flagSeasonal(ev, prof, minN = 11)
      .select("is_outlier").as[Boolean].collect()
    assert(few.forall(_ == false))
  }

  test("flagSeasonal: decimal bound enforced eagerly on the profile " +
    "and per-row on the quantized value") {
    val ev = Seq(
      (1L, ts(1), "a", 5.0), (2L, ts(2), "a", 6.0),
      (3L, ts(3), "a", 2.0e15)).toDF("event_id", "ts", "event_type", "value")
    val prof = Temporal.seasonalProfile(
      ev.filter(col("event_id") < 3L))
    val e = intercept[Exception](
      Anomaly.flagSeasonal(ev, prof).collect())
    assert(e.getMessage.contains("decimal(38,0)"), e.getMessage)
  }
}
