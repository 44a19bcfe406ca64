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
}
