package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class CohortSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("weekly retention triangle: cohort = first week, distinct users") {
    // 2024-01-01 is a Monday
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), // cohort W0
      (1L, ts("2024-01-03 10:00:00")), // same week: counts once
      (1L, ts("2024-01-09 10:00:00")), // W1
      (2L, ts("2024-01-04 10:00:00")), // cohort W0
      (3L, ts("2024-01-10 10:00:00"))) // cohort W1
      .toDF("user_id", "ts")
    val got = Cohort.retention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2))).toSet
    assert(got === Set(
      ("2024-01-01", 0L, 2L), // u1, u2 in cohort week 0
      ("2024-01-01", 1L, 1L), // u1 retained into week 1
      ("2024-01-08", 0L, 1L))) // u3's own cohort
  }

  test("day period: period_no is the day distance") {
    val ev = Seq(
      (1L, ts("2024-03-01 01:00:00")), (1L, ts("2024-03-04 23:00:00")))
      .toDF("user_id", "ts")
    val got = Cohort.retention(ev, period = "day")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 1L), (3L, 1L)))
  }

  test("matches a brute-force reference on a random corpus") {
    val rnd = new scala.util.Random(31)
    val base = ts("2024-01-01 00:00:00").getTime
    val ev = (1 to 400).map(_ => (rnd.nextInt(25).toLong,
      new Timestamp(base + rnd.nextInt(90) * 86400000L)))
    // reference: truncate to ISO Monday weeks via LocalDate
    def week(t: Timestamp) = {
      val d = t.toLocalDateTime.toLocalDate
      d.minusDays((d.getDayOfWeek.getValue - 1).toLong)
    }
    val act = ev.map { case (u, t) => (u, week(t)) }.distinct
    val cohort = act.groupBy(_._1).map { case (u, ws) =>
      u -> ws.map(_._2).min(Ordering.by((d: java.time.LocalDate) =>
        d.toEpochDay))
    }
    val want = act.groupBy { case (u, w) =>
      (cohort(u), (w.toEpochDay - cohort(u).toEpochDay) / 7)
    }.map { case (k, v) => (k._1.toString, k._2, v.size.toLong) }.toSet
    val got = Cohort.retention(ev.toDF("user_id", "ts"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2))).toSet
    assert(got === want)
  }
}
