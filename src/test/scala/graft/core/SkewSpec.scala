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

  test("saltedJoin == plain inner equi-join, duplicates included") {
    // hot key 0 on the probe side; build side with multiple rows per key
    // (each probe row must meet EVERY matching build row exactly once)
    val left = ((1 to 500).map(i => (i.toLong, 0L)) ++
      (1 to 50).map(i => (1000L + i, i % 5 + 1L))).toDF("row_id", "k")
    val right = Seq((0L, "a"), (0L, "b"), (1L, "c"), (2L, "d"), (9L, "e"))
      .toDF("k", "payload")
    val got = Skew.saltedJoin(left, right, "k", "row_id", saltBuckets = 8)
      .select("row_id", "k", "payload")
    val want = left.join(right, Seq("k")).select("row_id", "k", "payload")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("saltedJoin spreads a hot probe key across salt buckets") {
    val left = (1 to 400).map(i => (i.toLong, 0L)).toDF("row_id", "k")
    val buckets = left
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
      .select("__salt").distinct().count()
    assert(buckets > 4, s"hot key stayed on $buckets buckets")
  }

  test("hot key is split across salt buckets in phase 1") {
    val phase1 = rows
      .withColumn("__salt", pmod(xxhash64(col("v")), lit(8)))
      .filter(col("k") === 0L)
      .select("__salt").distinct().count()
    assert(phase1 > 4, s"expected the hot key spread over buckets, got $phase1")
  }
}
