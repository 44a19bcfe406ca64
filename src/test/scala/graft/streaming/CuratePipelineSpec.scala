package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, Expectations, TextAnalysis}

class CuratePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    Expectations.notNull("text"),
    Expectations.rowCountBetween(1L, 1000000L))

  private def rules(in: DataFrame): DataFrame =
    in.filter(TextAnalysis.tokenCount(col("text")) >= 3)

  // docs: ids 1..12; 10/11 duplicate 1/2's text; 12 fails the rule
  private def docs = Seq(
    (1L, "the quick brown fox"), (2L, "lorem ipsum dolor sit"),
    (3L, "alpha beta gamma"), (4L, "one two three four"),
    (5L, "five six seven"), (6L, "eight nine ten"),
    (10L, "the quick brown fox"), (11L, "lorem ipsum dolor sit"),
    (12L, "short one")).toDF("doc_id", "text")

  test("stream chain equals the batch chain; duplicates drop across " +
    "micro-batches; reports and metrics land per batch") {
    val dir = tmpDir("curatee2e")
    val (idx, out, ckpt) = (s"$dir/idx", s"$dir/out", s"$dir/ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = CuratePipeline.run(mem.toDS().toDF("doc_id", "text"),
      checks, rules, idx, out, ckpt)
    val rows = docs.as[(Long, String)].collect().toSeq
    try {
      val (h1, h2) = rows.partition(_._1 <= 4)
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable()
    } finally q.stop()
    // batch chain: rules then exact survivors over the whole feed
    val want = Dedup.exactSurvivors(rules(docs))
      .select("survivor_id").as[Long].collect().toSet
    val got = CuratePipeline.corpus(spark, out)
      .select("doc_id").as[Long].collect().toSet
    assert(got === want)
    assert(!got.contains(12L), "rule-failing doc must not land")
    // dup content later in the stream never lands (10/11 echo 1/2)
    assert(!got.contains(10L) && !got.contains(11L))
    // reports: one row per check per batch, metrics: one row per batch
    val reps = CuratePipeline.reports(spark, out)
      .groupBy("batch_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(reps.keySet === Set(0L, 1L))
    assert(reps.values.forall(_ === checks.length.toLong))
    val mets = CuratePipeline.metrics(spark, out)
      .select("batch_id", "n_in", "n_curated", "n_accepted")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(mets(0L)._2 === 4L)
    assert(mets.values.map(_._4).sum === want.size.toLong)
  }

  test("replaying a batch is idempotent end-to-end: no duplicate corpus " +
    "rows, report/metrics partitions rewritten not appended") {
    val dir = tmpDir("curatereplay")
    val (idx, out) = (s"$dir/idx", s"$dir/out")
    val b0 = docs.filter(col("doc_id") <= 4)
    val m1 = CuratePipeline.curateBatch(spark, b0, 0L, checks, rules,
      idx, out)
    val corpus1 = CuratePipeline.corpus(spark, out)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // simulated crash-replay: same rows, same batch id
    val m2 = CuratePipeline.curateBatch(spark, b0, 0L, checks, rules,
      idx, out)
    assert(m2.nAccepted === m1.nAccepted,
      "replay must report the batch's TRUE accepted count, not 0 — " +
        "the metrics row it rewrites must still sum with the corpus")
    assert(m2.nIn === m1.nIn && m2.nCurated === m1.nCurated)
    val corpus2 = CuratePipeline.corpus(spark, out)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(corpus2 === corpus1)
    assert(CuratePipeline.reports(spark, out)
      .filter(col("batch_id") === 0).count() === checks.length.toLong)
    // the REWRITTEN metrics partition still carries the true count
    val acc = CuratePipeline.metrics(spark, out)
      .filter(col("batch_id") === 0)
      .select("n_accepted").as[Long].collect().toSeq
    assert(acc === Seq(m1.nAccepted))
  }

  test("compactIngest: corpus and index fold to N files, content and " +
    "dedup semantics preserved, per-batch reports/metrics untouched, " +
    "replayed pre-compaction batch lands nothing") {
    val dir = tmpDir("curatecompact")
    val (idx, out) = (s"$dir/idx", s"$dir/out")
    val b0 = docs.filter(col("doc_id") <= 4)
    val b1 = docs.filter(col("doc_id") > 4)
    CuratePipeline.curateBatch(spark, b0, 0L, checks, rules, idx, out)
    CuratePipeline.curateBatch(spark, b1, 1L, checks, rules, idx, out)
    val before = CuratePipeline.corpus(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq
    val idxBefore = spark.read.parquet(idx)
      .select("fingerprint").as[String].collect().sorted.toSeq
    val (nc, ni) = CuratePipeline.compactIngest(spark, idx, out,
      numFiles = 2)
    assert(nc <= 2L && ni <= 2L, s"file counts after compact: $nc, $ni")
    // content identical (batch provenance folds into the archive
    // partition; doc rows and fingerprints byte-preserved)
    assert(CuratePipeline.corpus(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq
      === before)
    assert(spark.read.parquet(idx)
      .select("fingerprint").as[String].collect().sorted.toSeq
      === idxBefore)
    // reports/metrics keep their per-batch partitions and history
    assert(CuratePipeline.reports(spark, out)
      .select("batch_id").distinct().as[Long].collect().toSet
      === Set(0L, 1L))
    assert(CuratePipeline.metrics(spark, out).count() === 2L)
    // a replayed pre-compaction batch probes to zero survivors and its
    // partition is gone: nothing lands, the corpus stays compacted
    val m = CuratePipeline.curateBatch(spark, b1, 1L, checks, rules,
      idx, out)
    assert(m.nAccepted === 0L)
    assert(CuratePipeline.corpus(spark, out)
      .select("doc_id", "text").as[(Long, String)].collect().sorted.toSeq
      === before)
    // and a genuinely NEW batch still appends beside the archive
    val b2 = Seq((20L, "brand new words here")).toDF("doc_id", "text")
    val m2 = CuratePipeline.curateBatch(spark, b2, 2L, checks, rules,
      idx, out)
    assert(m2.nAccepted === 1L)
    assert(CuratePipeline.corpus(spark, out)
      .filter(col("batch_id") === 2).count() === 1L)
  }

  test("in-stream auto-compaction: compactEveryBatches folds the " +
    "layout mid-stream, content equals the batch chain, later batches " +
    "keep appending") {
    val dir = tmpDir("curateautocompact")
    val (idx, out, ckpt) = (s"$dir/idx", s"$dir/out", s"$dir/ckpt")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = CuratePipeline.run(mem.toDS().toDF("doc_id", "text"),
      checks, rules, idx, out, ckpt,
      compactEveryBatches = Some(2), compactFiles = 1)
    val rows = docs.as[(Long, String)].collect().toSeq
    try {
      val (h1, rest) = rows.partition(_._1 <= 3)
      // batch 2 must carry a NOVEL doc (6) — 10/11 are cross-batch dups
      // and 12 fails the rule, so a {10,11,12}-only batch lands nothing
      val (h2, h3) = rest.partition(_._1 <= 5)
      mem.addData(h1: _*); q.processAllAvailable()
      mem.addData(h2: _*); q.processAllAvailable() // batch 1 → compact
      mem.addData(h3: _*); q.processAllAvailable() // appends beside it
    } finally q.stop()
    val corpus = CuratePipeline.corpus(spark, out)
    // batches 0/1 folded into the archive partition, batch 2 beside it
    assert(corpus.select("batch_id").distinct()
      .as[Int].collect().toSet === Set(-1, 2))
    val want = Dedup.exactSurvivors(rules(docs))
      .select("survivor_id").as[Long].collect().toSet
    assert(corpus.select("doc_id").as[Long].collect().toSet === want)
  }
}
