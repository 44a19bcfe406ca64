package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Profile

class ProfileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def feed(rows: (String, Long)*) = rows.toDF("k", "id")

  test("per-batch HLL states fold at read to EXACTLY the one-shot " +
    "estimates (register maxima are order-independent); counts sum; " +
    "a REPLAYED batch overwrites its own partition") {
    val all = (0 until 400).map(i => (s"k${i % 3}", (i % 97).toLong))
    val (b0, b1) = all.partition(_._2 % 2 == 0)
    val path = tmpDir("profile_stream") + "/p"
    ProfileStream.writeDelta(feed(b0: _*), path, 0L, "k", "id")
    ProfileStream.writeDelta(feed(b1: _*), path, 1L, "k", "id")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Double, Long)].collect().toSet
    val folded = snap(ProfileStream.readEstimates(spark, path, "k"))
    val oneShot = snap(Profile.mergeHllStates(
      Profile.hllStates(feed(all: _*), "k", "id"), "k"))
    assert(folded == oneShot)
    // counts are exact; estimates inside the lgK=12 error band
    val exact = all.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.length.toLong, xs.map(_._2).distinct.length)) }
    folded.foreach { case (k, est, n) =>
      assert(n == exact(k)._1)
      assert(math.abs(est - exact(k)._2) <= exact(k)._2 * 0.1,
        s"$k: $est vs ${exact(k)._2}")
    }
    // replay
    ProfileStream.writeDelta(feed(b1: _*), path, 1L, "k", "id")
    assert(snap(ProfileStream.readEstimates(spark, path, "k")) == folded)
  }

  test("per-batch KLL states fold at read within the rank-error " +
    "contract of the WHOLE feed; counts sum; replay overwrites") {
    // skewed-ish values so p50/p95 differ meaningfully per key
    val all = (0 until 3000).map(i =>
      (s"k${i % 3}", (i % 100) * (1.0 + (i % 3))))
    val batches = all.grouped(800).toSeq
    val path = tmpDir("profile_kll") + "/q"
    batches.zipWithIndex.foreach { case (b, i) =>
      ProfileStream.writeQuantileDelta(
        b.toDF("k", "v"), path, i.toLong, "k", "v")
    }
    val folded = ProfileStream.readQuantiles(spark, path, "k")
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // exact discrete order statistics of the full feed (the a15
    // contract: the sketch returns an ELEMENT whose rank is within
    // eps*n of the target; k=2048 puts eps well under 1%)
    val exact = all.groupBy(_._1).map { case (k, xs) =>
      val vs = xs.map(_._2).sorted
      def at(q: Double) = vs(math.ceil(q * vs.length).toInt - 1)
      k -> ((at(0.5), at(0.95), vs.length.toLong))
    }
    folded.foreach { case (k, (p50, p95, n)) =>
      val (e50, e95, en) = exact(k)
      assert(n == en, s"$k count")
      // rank-contract check: the returned element's exact rank must sit
      // within 1% of the target rank
      val vs = all.filter(_._1 == k).map(_._2).sorted
      def rankOf(v: Double) = vs.count(_ <= v).toDouble / vs.length
      assert(math.abs(rankOf(p50) - 0.5) <= 0.01, s"$k p50 $p50 vs $e50")
      assert(math.abs(rankOf(p95) - 0.95) <= 0.01, s"$k p95 $p95 vs $e95")
    }
    // replay of the last batch changes nothing
    ProfileStream.writeQuantileDelta(batches.last.toDF("k", "v"), path,
      (batches.length - 1).toLong, "k", "v")
    val again = ProfileStream.readQuantiles(spark, path, "k")
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again == folded)
  }
}
