package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed tables must actually eliminate the exchange on the bucketed
  * side — the plan assertion is the point, not just result equality. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val membership =
    (1 to 2000).map(i => (i % 50L, i % 97L)).toDF("pathway_id", "protein_id")
  private lazy val pathways =
    (0 until 50).map(i => (i.toLong, s"P$i")).toDF("pathway_id", "name")

  test("groupBy on the bucket key runs with no Exchange") {
    val dir = tmpDir("bucketing")
    Bucketing.writeBucketed(membership, "b_membership",
      s"$dir/membership", "pathway_id", buckets = 4)
    val q = Bucketing.read(spark, "b_membership")
      .groupBy("pathway_id").agg(count(lit(1)).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed aggregation must not shuffle:\n$plan")
    // result parity with the unbucketed frame
    val want = membership.groupBy("pathway_id").agg(count(lit(1)).as("n"))
    assert(q.exceptAll(want).isEmpty && want.exceptAll(q).isEmpty)
  }

  test("join of two co-bucketed tables shuffles neither side") {
    val dir = tmpDir("bucketing2")
    Bucketing.writeBucketed(membership, "b_membership2",
      s"$dir/membership", "pathway_id", buckets = 4)
    Bucketing.writeBucketed(pathways, "b_pathways2",
      s"$dir/pathways", "pathway_id", buckets = 4)
    // disable broadcast so the co-located sort-merge path is what's tested
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = Bucketing.read(spark, "b_membership2")
        .join(Bucketing.read(spark, "b_pathways2"), "pathway_id")
        .groupBy("name").agg(count(lit(1)).as("n"))
      q.collect()
      // final AQE plan only — the appended "Initial Plan" section would
      // alias the assertions below
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the join itself must be exchange-free; only the final groupBy on
      // `name` (a different key) may shuffle
      val joinSubtree = plan.split("\n")
        .dropWhile(l => !l.contains("SortMergeJoin"))
      assert(joinSubtree.nonEmpty, s"expected a SortMergeJoin in:\n$plan")
      assert(!joinSubtree.exists(_.contains("Exchange")),
        s"co-bucketed join must not shuffle either side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
