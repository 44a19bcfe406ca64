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
}
