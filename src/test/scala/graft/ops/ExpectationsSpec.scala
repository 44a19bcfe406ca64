package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("scalar suite: exact fractions, pass/fail per check, nulls " +
    "excluded from value-level checks") {
    val df = Seq(
      (Some(1L), Some("a"), Some(5.0)),
      (Some(2L), Some("b"), Some(50.0)),
      (Some(2L), None, Some(-1.0)), // dup id, null name, out of bounds
      (Some(4L), Some("zz"), None)) // bad category, null score
      .toDF("id", "cat", "score")
    val got = report(Expectations.run(df, Seq(
      Expectations.notNull("id"),
      Expectations.notNull("cat"),
      Expectations.mostlyNotNull("cat", 0.5),
      Expectations.unique("id"),
      Expectations.bounds("score", 0.0, 100.0),
      Expectations.valuesIn("cat", Seq("a", "b")),
      Expectations.rowCountBetween(1L, 10L))))
    assert(got("not_null(id)") === ((1.0, true)))
    assert(got("not_null(cat)") === ((0.75, false)))
    assert(got("mostly_not_null(cat,0.5)") === ((0.75, true)))
    assert(got("unique(id)") === ((0.75, false))) // 3 distinct / 4
    assert(got("bounds(score,0.0,100.0)")._1 === 2.0 / 3.0) // null skipped
    assert(!got("bounds(score,0.0,100.0)")._2)
    assert(got("values_in(cat)") === ((2.0 / 3.0, false)))
    assert(got("row_count(1,10)") === ((4.0, true)))
  }

  test("empty frame: completeness conventions hold, row count fails") {
    val df = Seq.empty[(Option[Long], Option[String])].toDF("id", "cat")
    val got = report(Expectations.run(df, Seq(
      Expectations.notNull("id"), Expectations.unique("id"),
      Expectations.rowCountBetween(1L, 10L))))
    assert(got("not_null(id)") === ((1.0, true)))
    assert(got("unique(id)") === ((1.0, true)))
    assert(got("row_count(1,10)") === ((0.0, false)))
  }

  test("foreignKey: orphan count, nulls ignored, report union-compatible") {
    val df = Seq((1L, "x"), (5L, "y"), (9L, "z")).toDF("fk", "v")
    val dim = Seq((1L, "d"), (5L, "d")).toDF("pk", "d")
    val fk = Expectations.foreignKey(df, "fk", dim, "pk")
    val got = report(Expectations.run(df,
      Seq(Expectations.notNull("fk"))).unionByName(fk))
    assert(got("foreign_key(fk->pk)") === ((1.0, false))) // 9 is orphan
  }

  test("the scalar suite is ONE aggregation pass: a single scan of the " +
    "input, no window, no join") {
    val p = s"${tmpDir("expect")}/t"
    (0 until 64).map(i => (i.toLong, s"c${i % 3}", i * 1.0))
      .toDF("id", "cat", "score").write.parquet(p)
    val df = spark.read.parquet(p)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      val out = Expectations.run(df, Seq(
        Expectations.notNull("id"), Expectations.bounds("score", 0, 100),
        Expectations.valuesIn("cat", Seq("c0", "c1", "c2")),
        Expectations.rowCountBetween(1, 1000)))
      out.collect()
      out.queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.size === 1, s"suite must scan the input ONCE:\n$plan")
    assert(!plan.toString.contains("Window") &&
      !plan.toString.contains("Join"), s"unexpected operator:\n$plan")
  }

  test("trail: per-check prev/delta/flip over the batch history; first " +
    "batch reports null prev and no flip") {
    val reports = Seq(
      ("not_null(x)", 0L, 1.0, true),
      ("not_null(x)", 1L, 0.8, false),
      ("not_null(x)", 2L, 0.8, false),
      ("bounds(y)", 0L, 1.0, true),
      ("bounds(y)", 1L, 1.0, true))
      .toDF("check", "batch_id", "metric", "passed")
    val got = Expectations.trail(reports)
      .as[(String, Long, Double, Option[Double], Option[Double],
        Boolean, Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._4, r._5, r._6))).toMap
    assert(got(("not_null(x)", 0L)) === ((None, None, false)))
    assert(got(("not_null(x)", 1L)) ===
      ((Some(1.0), Some(0.8 - 1.0), true))) // metric fell AND verdict flipped
    assert(got(("not_null(x)", 2L)) === ((Some(0.8), Some(0.0), false)))
    assert(got(("bounds(y)", 1L)) === ((Some(1.0), Some(0.0), false)))
  }
}
