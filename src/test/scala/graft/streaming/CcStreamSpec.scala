package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.bel.{ConnectedComponents, IncrementalCC}

class CcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long)].collect().toMap

  test("streamed edge batches fold to the same labels as a from-scratch " +
    "run over the union; replayed batches rewrite nothing") {
    val dir = tmpDir("ccstream")
    val (idx, ckpt) = (s"$dir/idx", s"$dir/ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq(("a", "b"), ("c", "d"), ("e", "f"))
    val b2 = Seq(("b", "c"), ("f", "g"), ("x", "y"))
    val mem = MemoryStream[(String, String)]
    val q = CcStream.run(mem.toDS().toDF("src", "dst"), idx, ckpt,
      buckets = 8)
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val want = labels(ConnectedComponents.run(
      (b1 ++ b2).toDF("src", "dst")))
    assert(labels(IncrementalCC.readIndex(spark, idx)) === want)
    // crash-replay: re-folding an already-folded batch rewrites nothing
    // and leaves the labels bit-identical
    val touched = CcStream.foldBatch(spark, idx,
      b2.toDF("src", "dst"), buckets = 8)
    assert(touched === 0L)
    assert(labels(IncrementalCC.readIndex(spark, idx)) === want)
  }

  test("first batch creates the index; a lone later singleton folds in") {
    val dir = tmpDir("ccstream2")
    val idx = s"$dir/idx"
    // creation reports the buckets actually WRITTEN (truthful
    // accounting, the foldIndex contract): one component → one bucket
    // directory, not the nominal modulus 4
    assert(CcStream.foldBatch(spark, idx,
      Seq(("p", "q")).toDF("src", "dst"), buckets = 4) === 1L)
    CcStream.foldBatch(spark, idx, Seq(("z", "z")).toDF("src", "dst"),
      buckets = 4)
    val got = labels(IncrementalCC.readIndex(spark, idx))
    assert(got.keySet === Set("p", "q", "z"))
    assert(got("p") === got("q"))
    assert(got("z") !== got("p"))
  }
}
