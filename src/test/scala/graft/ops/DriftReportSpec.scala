package graft.ops

import graft.SparkSpec

class DriftReportSpec extends SparkSpec {
  import spark.implicits._

  test("per-group integer drift measures against a hand-computed case") {
    val a = Seq(
      (1L, "en", "alpha beta beta"),
      (2L, "en", "alpha gamma"),
      (3L, "de", "eins zwei"))
      .toDF("doc_id", "lang", "text")
    val b = Seq(
      (4L, "en", "alpha alpha delta"), // beta,gamma vanish; delta new
      (5L, "de", "eins zwei"))
      .toDF("doc_id", "lang", "text")
    val got = TextAnalysis.driftReport(a, b)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // en: a = {alpha:2, beta:2, gamma:1}, b = {alpha:2, delta:1}
    //   vocab 3 vs 2; new 1 (delta); vanished 2; tokens 5 vs 3;
    //   l1 = |2-2| + |2-0| + |1-0| + |0-1| = 4
    assert(got("en") === ((3L, 2L, 1L, 2L, 5L, 3L, 4L)))
    // de unchanged: l1 = 0, nothing new or vanished
    assert(got("de") === ((2L, 2L, 0L, 0L, 2L, 2L, 0L)))
  }

  test("identical snapshots report zero drift everywhere") {
    val a = (0 until 40).map(i =>
      (i.toLong, s"l${i % 3}", s"word$i common token common"))
      .toDF("doc_id", "lang", "text")
    TextAnalysis.driftReport(a, a).collect().foreach { r =>
      assert(r.getLong(3) === 0L) // new_words
      assert(r.getLong(4) === 0L) // vanished_words
      assert(r.getLong(7) === 0L) // l1
      assert(r.getLong(1) === r.getLong(2)) // vocab stable
    }
  }
}
