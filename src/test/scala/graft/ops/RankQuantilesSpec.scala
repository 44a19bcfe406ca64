package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankQuantilesSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("groupQuantiles matches a driver-side percentile_cont reference " +
    "on a random quantized corpus") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 2000).map(_ =>
      (rnd.nextInt(3).toLong, rnd.nextInt(100).toLong))
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val got = Rank.groupQuantiles(rows.toDF("k", "v"), Seq("k"), "v", ps)
      .as[(Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((k, vs) <- rows.groupBy(_._1); p <- ps) {
      val sorted = vs.map(_._2.toDouble).sorted
      val rank = p * (sorted.length - 1)
      val (lo, hi) = (sorted(rank.floor.toInt), sorted(rank.ceil.toInt))
      val want = lo + (rank - rank.floor) * (hi - lo)
      assert(math.abs(got((k, p)) - want) < 1e-9, s"k=$k p=$p")
    }
  }

  test("groupQuantiles plan: one hash aggregation, no window, no " +
    "global sort") {
    val df = Rank.groupQuantiles(
      (1 to 100).map(i => (i % 3L, i.toLong)).toDF("k", "v"),
      Seq("k"), "v", Seq(0.5))
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case w: WindowExec => w }.isEmpty,
      s"quantiles must not plan a window:\n$plan")
    val shuffles = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e }
    assert(shuffles.size === 1, s"expected ONE key exchange:\n$plan")
  }

  test("winsorize clips at the per-group continuous quantile bounds") {
    // group a: 1..11 → p10 = 2.0, p90 = 10.0 (exact interpolation at
    // rank p·(n−1)); group b is constant → bounds collapse, clip = v
    val df = ((1 to 11).map(v => ("a", v.toDouble)) ++
      Seq(("b", 5.0), ("b", 5.0))).toDF("k", "v")
    val got = Rank.winsorize(df, Seq("k"), "v", lo = 0.1, hi = 0.9)
      .select("k", "v", "q_lo", "q_hi", "clipped")
      .as[(String, Double, Double, Double, Double)].collect()
    val a = got.filter(_._1 == "a")
    assert(a.forall(r => r._3 == 2.0 && r._4 == 10.0))
    assert(a.find(_._2 == 1.0).get._5 == 2.0) // clipped up
    assert(a.find(_._2 == 11.0).get._5 == 10.0) // clipped down
    assert(a.find(_._2 == 6.0).get._5 == 6.0) // untouched inside
    assert(got.filter(_._1 == "b").forall(r => r._5 == 5.0))
  }

  test("winsorize: the bounds join is a BROADCAST — the corpus never " +
    "shuffles") {
    val df = (1 to 200).map(i => (s"g${i % 4}", i.toDouble)).toDF("k", "v")
    val out = Rank.winsorize(df, Seq("k"), "v", 0.05, 0.95)
    out.collect()
    val plan = out.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j }.nonEmpty, s"bounds must broadcast:\n$plan")
  }

  test("percentRankBy: [0,1] scaling, ties share, singleton group is 0") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0),
      ("b", 5.0)).toDF("k", "v")
    val got = Rank.percentRankBy(df, Seq("k"), "v")
      .select("k", "v", "pr").as[(String, Double, Double)]
      .collect().groupBy(_._1)
    val a = got("a").map(r => (r._2, r._3)).sorted
    // ranks over n=4: 10→(1−1)/3=0, 20→(2−1)/3 shared, 30→(4−1)/3=1
    assert(a.toSeq == Seq((10.0, 0.0), (20.0, 1.0 / 3), (20.0, 1.0 / 3),
      (30.0, 1.0)))
    assert(got("b").head._3 == 0.0)
    intercept[IllegalArgumentException](
      Rank.percentRankBy(df, Seq.empty, "v"))
  }

  test("sentences: terminator runs split, indices stable across the " +
    "empty-fragment drop, exact word counts") {
    val docs = Seq(
      (1L, "One two. Three!!  Four five six? "),
      (2L, "No terminators here"),
      (3L, "A.B stays joined. Next")).toDF("doc_id", "text")
    val got = TextAnalysis.sentences(docs)
      .select("doc_id", "sent_idx", "sentence", "n_words")
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got == Set(
      (1L, 0, "One two", 2L), (1L, 1, "Three", 1L),
      (1L, 2, "Four five six", 3L), // trailing "? " fragment dropped
      (2L, 0, "No terminators here", 3L),
      (3L, 0, "A.B stays joined", 3L), (3L, 1, "Next", 1L)))
  }

  test("modeBy: highest count wins, count ties break to the smallest " +
    "value, no window in the plan") {
    val df = Seq(("a", 3L), ("a", 3L), ("a", 1L), ("a", 7L), ("a", 7L),
      ("b", 9L)).toDF("k", "v")
    val out = Rank.modeBy(df, Seq("k"), "v")
    val got = out.select("k", "mode", "n")
      .as[(String, Long, Long)].collect().toSet
    // "a": 3 and 7 both count 2 → smaller value 3 wins
    assert(got == Set(("a", 3L, 2L), ("b", 9L, 1L)))
    val plan = out.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case w: WindowExec => w }.isEmpty,
      s"mode must not plan a window:\n$plan")
    intercept[IllegalArgumentException](Rank.modeBy(df, Seq.empty, "v"))
  }

  test("winsorize rejects bad fractions and empty keys") {
    val df = Seq(("a", 1.0)).toDF("k", "v")
    intercept[IllegalArgumentException](
      Rank.winsorize(df, Seq.empty, "v", 0.1, 0.9))
    intercept[IllegalArgumentException](
      Rank.winsorize(df, Seq("k"), "v", 0.9, 0.1))
  }
}
