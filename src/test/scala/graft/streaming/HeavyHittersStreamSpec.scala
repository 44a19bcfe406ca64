package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mgChecks(hits: Map[String, Long], items: Seq[String],
                       k: Int): Unit = {
    val exact = items.groupBy(identity).map { case (v, xs) =>
      v -> xs.length.toLong }
    val n = items.length.toLong
    assert(hits.size <= k)
    hits.foreach { case (v, est) =>
      val t = exact.getOrElse(v, 0L)
      assert(est <= t, s"over-count $v: $est > $t")
      assert((t - est) * (k + 1) <= n, s"bound broken for $v")
    }
    exact.foreach { case (v, t) =>
      if (t * (k + 1) > n) assert(hits.contains(v), s"missing heavy $v")
    }
  }

  test("per-batch summaries fold at read into a valid MG summary of " +
    "the WHOLE stream; replaying a batch is idempotent") {
    val b0 = Seq.fill(120)("the") ++ (1 to 80).map(i => s"a$i")
    val b1 = Seq.fill(90)("the") ++ Seq.fill(70)("of") ++
      (1 to 60).map(i => s"b$i")
    val path = tmpDir("hh_stream") + "/p"
    val k = 6
    HeavyHittersStream.writeDelta(b0.toDF("v"), path, 0L, "v", k)
    HeavyHittersStream.writeDelta(b1.toDF("v"), path, 1L, "v", k)
    val folded = HeavyHittersStream.readSummary(spark, path, k)
      .as[(String, Long)].collect().toMap
    mgChecks(folded, b0 ++ b1, k)
    assert(folded.contains("the") && folded.contains("of"))
    // replay: same batch id, same partition — fold unchanged
    HeavyHittersStream.writeDelta(b1.toDF("v"), path, 1L, "v", k)
    val replayed = HeavyHittersStream.readSummary(spark, path, k)
      .as[(String, Long)].collect().toMap
    assert(replayed == folded)
  }

  test("the read-time compact matches the Aggregator's merge step " +
    "(cut = (k+1)-th largest, strictly-positive remainder)") {
    val path = tmpDir("hh_cut") + "/p"
    // two batches whose per-batch summaries are exact (≤ k distinct),
    // so the fold input is known and the compact is checkable by hand
    HeavyHittersStream.writeDelta(
      (Seq.fill(10)("x") ++ Seq.fill(7)("y") ++ Seq.fill(4)("z"))
        .toDF("v"), path, 0L, "v", k = 3)
    HeavyHittersStream.writeDelta(
      (Seq.fill(6)("y") ++ Seq.fill(5)("w") ++ Seq.fill(2)("x"))
        .toDF("v"), path, 1L, "v", k = 3)
    // summed: x=12, y=13, z=4, w=5 → 4 items > k=3; cut = 4th largest
    // = 4 (z) → keep x=8, y=9, w=1
    val got = HeavyHittersStream.readSummary(spark, path, 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 8L, "y" -> 9L, "w" -> 1L), got.toString)
  }
}
