package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("incremental probe drops indexed content, dedupes within batch") {
    val dir = tmpDir("fpidx")
    val idx = s"$dir/idx"
    Dedup.writeFingerprintIndex(
      docs(1L -> "alpha beta", 2L -> "gamma delta"), idx)
    val batch = docs(
      10L -> "alpha  BETA",   // normalizes to indexed content → dropped
      11L -> "epsilon zeta",  // novel
      12L -> "Epsilon Zeta",  // in-batch dup of 11 → folded, 11 survives
      13L -> "eta theta")     // novel
    val out = Dedup.incrementalSurvivors(spark, idx, batch)
      .select("survivor_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((11L, 2L), (13L, 1L)))
  }

  test("append folds survivors; second probe of the same batch is empty") {
    val dir = tmpDir("fpidx2")
    val idx = s"$dir/idx"
    Dedup.writeFingerprintIndex(docs(1L -> "alpha beta"), idx)
    val batch = docs(10L -> "alpha beta", 11L -> "epsilon zeta")
    val appended = Dedup.appendToFingerprintIndex(spark, idx, batch)
    assert(appended == 1L) // only the novel fingerprint lands
    assert(Dedup.incrementalSurvivors(spark, idx, batch).isEmpty)
    // a LATER batch still probes correctly against the grown index
    val next = docs(20L -> "EPSILON  zeta", 21L -> "iota kappa")
    val out = Dedup.incrementalSurvivors(spark, idx, next)
      .select("survivor_id").as[Long].collect().toSet
    assert(out == Set(21L))
  }

  test("minhash index probe finds exact-verified near-dups, skips novel") {
    val dir = tmpDir("mhidx")
    val idx = s"$dir/idx"
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight"
    Dedup.writeMinHashIndex(
      docs(1L -> base, 2L -> ("completely unrelated text about spark " +
        "catalyst plans and shuffle partitions at scale today")), idx)
    val batch = docs(
      10L -> ("intro " + base), // near-dup of 1 (one extra word)
      11L -> ("novel content that matches nothing in the stored index " +
        "whatsoever since every shingle here is unique"))
    val out = Dedup.incrementalNearDups(spark, idx, batch, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1)
    val (id, idxId, j) = out(0)
    assert(id == 10L && idxId == 1L)
    // 17 shared 3-gram shingles of 19/21... exact value: verify bounds
    assert(j > 0.7 && j < 1.0)
  }

  test("appending a fully-known batch writes nothing") {
    val dir = tmpDir("fpidx3")
    val idx = s"$dir/idx"
    Dedup.writeFingerprintIndex(docs(1L -> "alpha beta"), idx)
    val before = spark.read.parquet(idx).count()
    assert(Dedup.appendToFingerprintIndex(spark, idx,
      docs(10L -> "ALPHA beta")) == 0L)
    assert(spark.read.parquet(idx).count() == before)
  }
}
