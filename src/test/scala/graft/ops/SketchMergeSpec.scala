package graft.ops

import graft.SparkSpec

class SketchMergeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(37)
    (0 until 5000).map(_ =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(800).toLong))
      .toDF("key", "id")
  }

  test("states round-trip parquet and merge to within-5% estimates, " +
    "counts exactly summed") {
    val df = corpus
    val dir = tmpDir("sketchmerge")
    // two disjoint "snapshots" persist their own state tables
    Profile.hllStates(df.filter("id % 2 = 0"), "key", "id")
      .write.parquet(s"$dir/s0")
    Profile.hllStates(df.filter("id % 2 = 1"), "key", "id")
      .write.parquet(s"$dir/s1")
    val states = spark.read.parquet(s"$dir/s0")
      .unionByName(spark.read.parquet(s"$dir/s1"))
    val merged = Profile.mergeHllStates(states, "key")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val exact = df.groupBy("key")
      .agg(org.apache.spark.sql.functions.countDistinct("id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (dExact, nExact)) =>
      val (dEst, nSum) = merged(k)
      assert(nSum === nExact, s"counts must sum exactly for $k")
      assert(math.abs(dEst - dExact) <= dExact * 0.05,
        s"estimate $dEst too far from exact $dExact for $k")
    }
  }

  // estimates are NOT bit-stable across arrival orders (HLL's HIP
  // estimator is insertion-order-sensitive) — the invariant that holds,
  // and that consumers rely on, is the error contract
  test("any snapshot arrival order lands within the 5% error contract") {
    val df = corpus
    val s0 = Profile.hllStates(df.filter("id % 3 = 0"), "key", "id")
    val s1 = Profile.hllStates(df.filter("id % 3 = 1"), "key", "id")
    val s2 = Profile.hllStates(df.filter("id % 3 = 2"), "key", "id")
    val exact = df.groupBy("key")
      .agg(org.apache.spark.sql.functions.countDistinct("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def est(states: org.apache.spark.sql.DataFrame) =
      Profile.mergeHllStates(states, "key")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (order <- Seq(
      s0.unionByName(s1).unionByName(s2),
      s2.unionByName(s0).unionByName(s1))) {
      est(order).foreach { case (k, e) =>
        assert(math.abs(e - exact(k)) <= exact(k) * 0.05,
          s"estimate $e off exact ${exact(k)} for $k")
      }
    }
  }
}
