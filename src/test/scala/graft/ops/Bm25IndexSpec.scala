package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the persisted incremental BM25 posting index: query parity with
  * the corpus-scan face, incremental-fold composition (two batches ==
  * one-shot build), probe-before-append idempotence, and the
  * partition-pruned posting scan (the band-index `bp` discipline
  * applied to search terms). */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val corpusRows: Seq[(Long, String)] = (0 until 48).map { i =>
    val topic = i % 4 match {
      case 0 => "spark shuffles data across the cluster for wide joins"
      case 1 => "vector embeddings capture semantics for retrieval"
      case 2 => "stream processing seals windows with watermarks"
      case _ => "plain prose about nothing in particular at all"
    }
    (i.toLong, s"$topic document $i with filler words ${i * 13} and " +
      (if (i % 8 == 0) "spark spark again" else "more text here"))
  }

  private val terms = Seq("spark", "vector", "stream")

  private def scored(df: DataFrame): Map[Long, (Long, Double)] =
    df.as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("index face equals the corpus-scan face value-for-value") {
    val idx = tmpDir("bm25_parity") + "/idx"
    val corpus = docs(corpusRows: _*)
    assert(TextSearch.writeBm25Index(spark, corpus, idx) == 48L)
    val direct = scored(TextSearch.bm25(corpus, terms))
    val viaIndex = scored(TextSearch.bm25FromIndex(spark, idx, terms))
    assert(viaIndex == direct && direct.nonEmpty)
  }

  test("two-batch fold equals the one-shot build; re-appending a known " +
    "batch lands nothing (probe-before-append)") {
    val one = tmpDir("bm25_oneshot") + "/idx"
    val two = tmpDir("bm25_fold") + "/idx"
    val (a, b) = corpusRows.partition(_._1 % 2 == 0)
    TextSearch.writeBm25Index(spark, docs(corpusRows: _*), one)
    assert(TextSearch.appendBm25Index(spark, two, docs(a: _*)) == a.size)
    assert(TextSearch.appendBm25Index(spark, two, docs(b: _*)) == b.size)
    assert(scored(TextSearch.bm25FromIndex(spark, two, terms)) ==
      scored(TextSearch.bm25FromIndex(spark, one, terms)))
    // idempotence: the same batch again is fully skipped, scores frozen
    val before = scored(TextSearch.bm25FromIndex(spark, two, terms))
    assert(TextSearch.appendBm25Index(spark, two, docs(a: _*)) == 0L)
    assert(scored(TextSearch.bm25FromIndex(spark, two, terms)) == before)
    assert(TextSearch.readStats(spark, two) ==
      TextSearch.readStats(spark, one))
  }

  test("the query's posting scan prunes to the terms' wp partitions " +
    "(PartitionFilters, strict subset of directories)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val idx = tmpDir("bm25_prune") + "/idx"
      TextSearch.writeBm25Index(spark, docs(corpusRows: _*), idx)
      val dirs = new java.io.File(TextSearch.postingsPath(idx))
        .listFiles().count(f => f.isDirectory && f.getName.startsWith("wp="))
      assert(dirs > 3, s"fixture should cover many wp partitions, got $dirs")
      val q = TextSearch.bm25FromIndex(spark, idx, terms)
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("postings")) => f
      }
      assert(scans.nonEmpty, "expected a posting scan")
      val s = scans.head.toString
      assert("PartitionFilters: \\[[^\\]]*wp".r.findFirstIn(s).isDefined,
        s"terms' wp IN-list must land in PartitionFilters:\n$s")
      val read = scans.head.selectedPartitions.partitionCount
      assert(read <= terms.size && read < dirs,
        s"posting scan must open only the terms' partitions: $read of $dirs")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("crash-window duplicate postings are healed at read: re-landing " +
    "one doc's postings without doclen does not change scores") {
    val idx = tmpDir("bm25_heal") + "/idx"
    val corpus = docs(corpusRows: _*)
    TextSearch.writeBm25Index(spark, corpus, idx)
    val before = scored(TextSearch.bm25FromIndex(spark, idx, terms))
    // simulate the postings-landed/doclen-lost replay: the same doc's
    // posting rows appended a second time, byte-identical content
    val dup = corpus.filter(col("doc_id") === 0L)
    dup.select(col("doc_id").as("id"),
        size(split(TextAnalysis.normalized(col("text")), " "))
          .cast("long").as("dl"),
        explode(split(TextAnalysis.normalized(col("text")), " ")).as("word"))
      .groupBy("word", "id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("wp", pmod(xxhash64(col("word")), lit(64L)))
      .write.mode("append").partitionBy("wp")
      .parquet(TextSearch.postingsPath(idx))
    assert(scored(TextSearch.bm25FromIndex(spark, idx, terms)) == before)
  }
}
