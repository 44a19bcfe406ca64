package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

/** The streaming MinHash near-dup index: value-equal to the batch
  * incremental chain on the same two-batch split, and replay-idempotent
  * (the r12 verdict's ask #3). */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  // long, shingle-rich docs so 3-gram Jaccard is meaningful; d0/d1 are
  // near-dups of each other, d2 is novel, d3 near-dups d0, d4 novel
  private val base = "the quick brown fox jumps over the lazy dog and " +
    "then runs far away into the deep green forest tonight without rest"
  private val other = "completely unrelated text about spark catalyst " +
    "plans and shuffle partitions and broadcast joins at corpus scale"
  private val third = "a third document whose words overlap neither the " +
    "fox sentence nor the spark sentence in any shingle of length three"

  private def b1 = Seq(
    1L -> base,
    2L -> ("intro " + base), // within-batch near-dup of 1 → dropped
    3L -> other)
  private def b2 = Seq(
    10L -> (base + " epilogue"), // near-dup of indexed 1 → dropped
    11L -> third,                // novel
    12L -> ("start " + third))   // within-batch near-dup of 11 → dropped

  private def runStream(dir: String): String = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = NearDupStream.run(mem.toDS().toDF("doc_id", "text"),
      s"$dir/idx", s"$dir/out", s"$dir/ckpt", threshold = 0.7)
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    s"$dir/out"
  }

  test("stream equals the batch incremental chain on a two-batch split") {
    val dir = tmpDir("neardup_eq")
    val out = runStream(dir)
    val got = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().toSet
    // batch chain from the same primitives: blanket b1, seed index,
    // blanket b2, probe, survivors
    assert(got == Set(1L, 3L, 11L))
    // the index holds exactly the accepted docs' signatures
    val idx = spark.read.parquet(s"$dir/idx").select("id")
      .as[Long].collect().toSet
    assert(idx == Set(1L, 3L, 11L))
    // and probing an accepted doc's own text now reports a hit
    val hit = Dedup.incrementalNearDups(spark, s"$dir/idx",
      Seq(99L -> third).toDF("doc_id", "text"), threshold = 0.7)
    assert(hit.select("index_id").as[Long].collect().toSet == Set(11L))
  }

  test("replaying a fully-committed batch lands nothing and keeps the " +
    "true accepted count (content-anchored idempotence)") {
    val dir = tmpDir("neardup_replay")
    runStream(dir)
    val before = spark.read.parquet(s"$dir/out").select("doc_id")
      .as[Long].collect().sorted.toSeq
    val idxBefore = spark.read.parquet(s"$dir/idx").count()
    // replay batch 1 through the batch face (same batchId): every doc
    // self-matches its indexed signature → nothing novel, partition
    // kept, TRUE count reported
    val n = NearDupStream.nearDupBatch(spark, s"$dir/idx", s"$dir/out",
      b1.toDF("doc_id", "text"), batchId = Some(0L), threshold = 0.7)
    assert(n == 2L) // b1 accepted 1 and 3
    assert(spark.read.parquet(s"$dir/out").select("doc_id")
      .as[Long].collect().sorted.toSeq == before)
    assert(spark.read.parquet(s"$dir/idx").count() == idxBefore)
  }

  test("crash window: corpus partition landed but index append lost — " +
    "replay recomputes survivors and repairs without duplicates") {
    val dir = tmpDir("neardup_crash")
    // simulate: batch 0 wrote its partition, then crashed before the
    // index append (no index directory at all)
    NearDupStream.nearDupBatch(spark, s"$dir/never", s"$dir/out",
      b1.toDF("doc_id", "text"), batchId = Some(0L), threshold = 0.7)
    graft.core.Fs.delete(spark, s"$dir/never")
    // replay against the REAL index path (missing = the lost append)
    val n = NearDupStream.nearDupBatch(spark, s"$dir/idx", s"$dir/out",
      b1.toDF("doc_id", "text"), batchId = Some(0L), threshold = 0.7)
    assert(n == 2L)
    assert(spark.read.parquet(s"$dir/out").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L))
    assert(spark.read.parquet(s"$dir/idx").select("id")
      .as[Long].collect().toSet == Set(1L, 3L))
  }

  test("ad-hoc batch face (no batchId): append-only, probe-first") {
    val dir = tmpDir("neardup_adhoc")
    val n1 = NearDupStream.nearDupBatch(spark, s"$dir/idx", s"$dir/out",
      b1.toDF("doc_id", "text"), threshold = 0.7)
    val n2 = NearDupStream.nearDupBatch(spark, s"$dir/idx", s"$dir/out",
      b2.toDF("doc_id", "text"), threshold = 0.7)
    assert(n1 == 2L && n2 == 1L)
    assert(spark.read.parquet(s"$dir/out").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L, 11L))
  }
}
