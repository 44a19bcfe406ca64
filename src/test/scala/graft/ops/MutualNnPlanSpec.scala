package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r11 verdict's top ask: the REGISTERED mutual-NN path
  * ([[Similarity.mutualTopOneAnn]]) must never broadcast a corpus-derived
  * side and never plan a nested-loop/cartesian product — the brute face's
  * |N|² broadcast product is exactly what the swap removed. Pinned with
  * AQE off and `autoBroadcastJoinThreshold = -1`, under which a broadcast
  * exchange can only appear from an explicit `broadcast()` hint — so a
  * zero-broadcast plan proves the operator does not FORCE a broadcast at
  * any corpus size (an AQE runtime downgrade of a small shuffle side to
  * broadcast-hash at toy SF remains allowed and is size-gated by
  * definition). */
class MutualNnPlanSpec extends SparkSpec {
  import spark.implicits._

  private def scoped[A](body: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }

  // parquet-backed (a local Seq would collapse into LocalTableScan and
  // hide the scan/exchange shape); a twin corpus so mutual pairs exist
  private lazy val vecs: DataFrame = {
    val p = s"${tmpDir("mnn_vecs")}/v"
    val base = (0 until 48).map(i => (i.toLong,
      Seq.tabulate(8)(j => math.sin(i * 13 + j))))
    val twins = base.map { case (i, v) =>
      (i + 1000L, v.map(_ + 0.001 * math.sin(i * 7)))
    }
    (base ++ twins).toDF("vec_id", "embedding").write.parquet(p)
    spark.read.parquet(p)
  }

  private def executed(df: DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("mutualTopOneAnn: no broadcast of any side, no nested-loop join, " +
    "candidates meet in a shuffled equi-join on the cell key") {
    scoped {
      val plan = executed(
        Similarity.mutualTopOneAnn(vecs, nList = 4, nProbe = 2))
      assert(plan.collect {
        case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"nested-loop join in the ANN plan:\n$plan")
      assert(plan.collect { case j: CartesianProductExec => j }.isEmpty,
        s"cartesian product in the ANN plan:\n$plan")
      assert(plan.collect { case b: BroadcastExchangeExec => b }.isEmpty,
        s"forced broadcast in the ANN plan (threshold is -1, so only an " +
          s"explicit hint plans one):\n$plan")
      val equi = plan.collect {
        case j: SortMergeJoinExec => j.leftKeys
        case j: ShuffledHashJoinExec => j.leftKeys
      }
      assert(equi.nonEmpty, s"expected shuffled equi-joins:\n$plan")
      assert(equi.exists(_.exists(_.toString.contains("cell"))),
        s"no equi-join keyed on the probe cell:\n$plan")
    }
  }

  test("the brute face's plan IS the broadcast nested-loop product " +
    "(the contrast the registered swap removes)") {
    scoped {
      val plan = executed(Similarity.mutualTopOne(vecs))
      assert(plan.collect {
        case j: BroadcastNestedLoopJoinExec => j }.nonEmpty,
        s"expected the brute face to plan a broadcast nested-loop " +
          s"product:\n$plan")
    }
  }

  test("nProbe == nList degrades to the exact brute answer") {
    val brute = Similarity.mutualTopOne(vecs)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val ann = Similarity.mutualTopOneAnn(vecs, nList = 4, nProbe = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(ann == brute)
    assert(brute.nonEmpty)
  }

  test("every planted twin pair is recovered at nProbe < nList " +
    "(the twin sits in its query's own top-probed cell)") {
    val pairs = Similarity.mutualTopOneAnn(vecs, nList = 4, nProbe = 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val planted = (0 until 48).map(i => (i.toLong, i + 1000L)).toSet
    assert(planted.subsetOf(pairs),
      s"missing planted pairs: ${planted -- pairs}")
  }
}
