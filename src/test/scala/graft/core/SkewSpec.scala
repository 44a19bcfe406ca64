package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted two-phase aggregations must be result-identical to the plain
  * forms and actually split hot keys across partial groups. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (0) carrying most values, plus normal keys; duplicate
  // values exercise the in-bucket dedup
  private lazy val rows = ((1 to 3000).map(i => (0L, s"v${i % 900}")) ++
    (1 to 200).map(i => (i % 10 + 1L, s"w${i % 40}"))).toDF("k", "v")

  test("saltedCollectSet == sort_array(collect_set)") {
    val got = Skew.saltedCollectSet(rows, Seq("k"), "v", "s", saltBuckets = 8)
    val want = rows.groupBy("k").agg(sort_array(collect_set(col("v"))).as("s"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("saltedCountDistinct == countDistinct") {
    val got = Skew.saltedCountDistinct(rows, Seq("k"), "v", "n",
      saltBuckets = 8)
    val want = rows.groupBy("k").agg(countDistinct(col("v")).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("hot key is split across salt buckets in phase 1") {
    val phase1 = rows
      .withColumn("__salt", pmod(xxhash64(col("v")), lit(8)))
      .filter(col("k") === 0L)
      .select("__salt").distinct().count()
    assert(phase1 > 4, s"expected the hot key spread over buckets, got $phase1")
  }
}
