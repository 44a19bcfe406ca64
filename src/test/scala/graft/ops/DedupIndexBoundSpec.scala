package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectSet
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r12 verdict's one weak item closed: the inverted-index
  * candidate generator must never hold a df-sized buffer in per-key
  * state. A shingle planted in EVERY document (df = corpus size, far
  * above the cap) must (a) still produce the exact df-capped pair set
  * and (b) never build a `collect_set` posting array AT ALL — since r14
  * the cold path emits C(k,2) via a shingle-keyed equi-self-join whose
  * inputs sit ABOVE the left-semi df-prune, so the join's per-key
  * buffered group is ≤ maxDF rows by construction and no list-building
  * aggregate exists anywhere in the plan (strictly stronger than the
  * r13 shape this spec originally pinned, where a collect_set existed
  * but was prune-bounded). */
class DedupIndexBoundSpec extends SparkSpec {
  import spark.implicits._

  private val maxDF = 4
  private val nDocs = 40

  // AQE wraps executed stages in leaf QueryStageExec nodes that
  // plan.collect does not descend into — pin plan shape with AQE off
  // (the MutualNnPlanSpec posture).
  private def aqeOff[A](body: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  // (id, shingles): shingle 999 in EVERY doc (hot, df = 40 > cap = 4);
  // shingle 100+g shared by the 4 docs of group g (cold, df = cap); one
  // unique shingle per doc (df = 1, below the ≥2 floor).
  private lazy val sh: DataFrame = {
    val p = s"${tmpDir("idx_bound")}/sh"
    (0 until nDocs).map { i =>
      (i.toLong, Seq(999L, 100L + i / 4, 10000L + i).sorted)
    }.toDF("id", "shingles").write.parquet(p)
    spark.read.parquet(p)
  }

  private def expectedPairs: Set[(Long, Long)] = {
    val star = (1 until nDocs).map(i => (0L, i.toLong))
    val cliques = (0 until nDocs).groupBy(_ / 4).values.flatMap { g =>
      for (a <- g; b <- g if a < b) yield (a.toLong, b.toLong)
    }
    (star ++ cliques).toSet
  }

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collectSetAggs(plan: SparkPlan): Seq[SparkPlan] = plan.collect {
    case a: ObjectHashAggregateExec
      if a.aggregateExpressions.exists(_.aggregateFunction.isInstanceOf[CollectSet]) => a
    case a: SortAggregateExec
      if a.aggregateExpressions.exists(_.aggregateFunction.isInstanceOf[CollectSet]) => a
    case a: HashAggregateExec
      if a.aggregateExpressions.exists(_.aggregateFunction.isInstanceOf[CollectSet]) => a
  }

  private def hasSemiJoinBelow(agg: SparkPlan): Boolean =
    agg.collect {
      case j: BaseJoinExec if j.joinType == LeftSemi => j
    }.nonEmpty

  test("a shingle in EVERY doc: pair set exact (star above cap, " +
    "C(k,2) at the cap) and no df-sized per-key state in the plan") {
    aqeOff {
      val cands = Dedup.invertedIndexCandidates(sh, maxDF)
      val plan = executed(cands)
      val got = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expectedPairs)

      // no posting-list array is ever built — the cold path is a join
      assert(collectSetAggs(plan).isEmpty,
        s"expected NO collect_set aggregate anywhere (r14 self-join " +
          s"candidate shape):\n$plan")
      // the pair-emitting equi-self-join (shingle key + id inequality)
      // sits ABOVE the left-semi df-prune on BOTH inputs, so its per-key
      // buffered group is ≤ maxDF rows by construction
      val pairJoins = plan.collect {
        case j: BaseJoinExec if j.joinType != LeftSemi &&
          j.condition.exists(_.exists {
            case lt: org.apache.spark.sql.catalyst.expressions.LessThan =>
              lt.references.forall(_.name == "id")
            case _ => false
          }) => j
      }
      assert(pairJoins.nonEmpty,
        s"expected the C(k,2) equi-self-join on the cold path:\n$plan")
      pairJoins.foreach { j =>
        assert(hasSemiJoinBelow(j),
          s"pair self-join NOT fed through the df-prune semi-join — " +
            s"its per-key group is unbounded on a hot shingle:\n$j")
      }
    }
  }

  test("hot-path star rides joins and count/min aggregates only — no " +
    "array-typed aggregate anywhere outside the semi-join-pruned subtree") {
    // All-hot corpus: ONLY the planted shingle, so the cold path is empty
    // and the whole candidate set must come from the aggregation-free star.
    val hotOnly = (0 until nDocs).map(i => (i.toLong, Seq(999L)))
      .toDF("id", "shingles")
    aqeOff {
      val cands = Dedup.invertedIndexCandidates(hotOnly, maxDF)
      val got = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === (1 until nDocs).map(i => (0L, i.toLong)).toSet)
      val plan = executed(cands)
      collectSetAggs(plan).foreach { a =>
        assert(hasSemiJoinBelow(a), s"unpruned collect_set:\n$a")
      }
    }
  }

  test("jaccardPairs end-to-end still exact over a text corpus with a " +
    "universal boilerplate shingle") {
    // Every doc shares an identical 5-word boilerplate head (all its
    // 3-gram shingles are corpus-df) plus a per-pair duplicated body.
    val head = "terms of service apply"
    val docs = (0 until 12).map { i =>
      val body = s"unique body ${i / 2} sentence alpha beta gamma delta " +
        s"epsilon zeta eta theta"
      (i.toLong, s"$head $body")
    }.toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, n = 3, threshold = 0.9, maxDF = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // consecutive even/odd ids share the full text ⇒ jaccard 1.0; the
    // boilerplate head is above the cap so it contributes only star
    // candidates, but the body shingles (df = 2) recover every twin pair
    assert((0 until 12 by 2).map(i => (i.toLong, i + 1L)).toSet.subsetOf(pairs))
  }
}
