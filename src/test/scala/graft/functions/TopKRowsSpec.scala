package graft.functions

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.SparkSpec

class TopKRowsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("topKPerGroup equals the row_number window on a random skewed " +
    "corpus, ascending and descending") {
    val rnd = new scala.util.Random(29)
    // skew: group 0 holds half the rows — the window-funnel case
    val df = (1 to 4000).map { i =>
      val g = if (rnd.nextBoolean()) 0L else rnd.nextInt(20).toLong
      (g, rnd.nextInt(50).toLong, i.toLong)
    }.toDF("g", "v", "id").repartition(16)
    df.createOrReplaceTempView("tkr")
    for (asc <- Seq(true, false)) {
      val got = graft.ops.Rank
        .topKPerGroup(df, Seq("g"), Seq("v", "id"), k = 5, ascending = asc)
        .as[(Long, Long, Long)].collect().toSet
      val dir = if (asc) "ASC" else "DESC"
      val want = spark.sql(
        s"""SELECT g, v, id FROM (
           |  SELECT g, v, id, row_number() OVER (
           |    PARTITION BY g ORDER BY v $dir, id $dir) AS rn FROM tkr)
           |WHERE rn <= 5""".stripMargin)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"ascending=$asc")
    }
  }

  test("k past the group size returns the whole group; payload rides " +
    "along and breaks ties") {
    val df = Seq((1L, 7L, "b"), (1L, 7L, "a"), (2L, 3L, "z"))
      .toDF("g", "v", "p")
    val got = graft.ops.Rank
      .topKPerGroup(df, Seq("g"), Seq("v"), k = 10)
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 7L, "a"), (1L, 7L, "b"), (2L, 3L, "z")))
  }

  test("plan: ObjectHashAggregate with a partial stage, no window, no " +
    "full sort of the input") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1 to 100).map(i => (i % 7L, i.toLong)).toDF("g", "v")
      val plan = graft.ops.Rank
        .topKPerGroup(df, Seq("g"), Seq("v"), k = 2)
        .queryExecution.executedPlan
      val objAggs = collect(plan) {
        case a: org.apache.spark.sql.execution.aggregate
            .ObjectHashAggregateExec => a
      }
      assert(objAggs.length === 2, "partial + final ObjectHashAggregate")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, "no window funnel")
      assert(collect(plan) {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, "no corpus-wide sort")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
