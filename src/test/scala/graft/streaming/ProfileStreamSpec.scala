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
}
