package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the persisted MinHash band layout and its partition-pruned probe
  * — the r13 weak's fix: a probe must NEVER re-scan and re-band the full
  * signature index (per-batch cost growing with index size); it reads
  * the bucket-partitioned band layout with the batch's own `bp` values
  * in PartitionFilters, so untouched partitions' files never open. */
class DedupIndexLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** A corpus whose band rows cover (w.h.p., deterministic for this
    * fixed text) every one of the 64 bp partitions. */
  private def corpus: DataFrame = docs((0 until 64).map(i =>
    (i.toLong, s"document number $i talks about topic ${i % 7} in long " +
      s"form with enough distinct words ${i * 31} to shingle broadly " +
      s"and so forth onward ${i * 17} again")): _*)

  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def bpDirs(bandPath: String): Seq[String] =
    new java.io.File(bandPath).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("bp="))
      .map(_.getName)

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
  }

  test("build lands both layouts; the probe's band scan carries the " +
    "batch's bp IN-list as a PartitionFilter and opens a strict subset " +
    "of partitions") {
    withoutAqe {
      val idx = s"${tmpDir("mh_layout")}/idx"
      Dedup.writeMinHashIndex(corpus, idx)
      val bandPath = Dedup.bandLayoutPath(idx)
      val dirs = bpDirs(bandPath)
      assert(dirs.size > 32,
        s"fixture corpus should cover most bp partitions, got ${dirs.size}")
      // a 1-doc batch has exactly 32 band rows → ≤ 32 distinct bp —
      // a strict subset of the index's partitions by pigeonhole
      val batch = docs(1000L -> ("document number 3 talks about topic 3 " +
        "in long form with enough distinct words 93 to shingle broadly " +
        "and so forth onward 51 again extra"))
      val probe = Dedup.incrementalNearDups(spark, idx, batch,
        threshold = 0.7)
      probe.collect()
      val scans = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("_bands")) => f
      }
      assert(scans.nonEmpty, "expected a scan of the persisted band " +
        s"layout:\n${probe.queryExecution.executedPlan}")
      val s = scans.head.toString
      assert("PartitionFilters: \\[[^\\]]*bp".r.findFirstIn(s).isDefined,
        s"probe bp IN-list must land in PartitionFilters:\n$s")
      // the join keys' isnotnull filters legitimately ride DataFilters;
      // bp itself must not (it prunes partitions, never filters rows)
      val dataFilters = "DataFilters: \\[[^\\]]*\\]".r.findFirstIn(s)
      assert(dataFilters.exists(!_.contains("bp#")),
        s"bp leaked into data filters:\n$s")
      val read = scans.head.selectedPartitions.partitionCount
      assert(read <= 32 && read < dirs.size,
        s"probe must open only the batch's partitions: read $read of " +
          s"${dirs.size}")
    }
  }

  test("probe output is IDENTICAL to the legacy full-scan band " +
    "derivation (band layout removed -> fallback path)") {
    val idx = s"${tmpDir("mh_legacy")}/idx"
    Dedup.writeMinHashIndex(corpus, idx)
    val batch = docs(
      1000L -> ("document number 3 talks about topic 3 in long form " +
        "with enough distinct words 93 to shingle broadly and so forth " +
        "onward 51 again"),
      2000L -> "novel rows that match nothing whatsoever in the index")
    def run(): Set[(Long, Long, Double)] =
      Dedup.incrementalNearDups(spark, idx, batch, threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val pruned = run()
    graft.core.Fs.delete(spark, Dedup.bandLayoutPath(idx))
    val legacy = run()
    assert(pruned == legacy && pruned.nonEmpty,
      s"pruned=$pruned legacy=$legacy")
    assert(pruned.forall(_._1 == 1000L))
  }

  test("append feeds both layouts; compactIndex folds files to one per " +
    "bp partition with probe results unchanged") {
    val idx = s"${tmpDir("mh_compact")}/idx"
    val (a, b) = ((0 until 64).toSeq.partition(_ % 2 == 0))
    def slice(ids: Seq[Int]): DataFrame = docs(ids.map(i =>
      (i.toLong, s"document number $i talks about topic ${i % 7} in " +
        s"long form with enough distinct words ${i * 31} to shingle " +
        s"broadly and so forth onward ${i * 17} again")): _*)
    Dedup.writeMinHashIndex(slice(a), idx)
    // simulate two micro-batch appends (the NearDupStream fold)
    for (ids <- b.grouped(16)) {
      val staged = Dedup.shingled(slice(ids.toSeq), 3, "doc_id", "text")
        .withColumn("sig", Dedup.minHashSignature(col("shingles"), 96))
      Dedup.appendMinHashIndexRows(spark, idx, staged, 32, 3)
    }
    val bandPath = Dedup.bandLayoutPath(idx)
    val batch = docs(1000L -> ("document number 8 talks about topic 1 " +
      "in long form with enough distinct words 248 to shingle broadly " +
      "and so forth onward 136 again"))
    def probe(): Set[(Long, Long)] =
      Dedup.incrementalNearDups(spark, idx, batch, threshold = 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probe()
    assert(before.nonEmpty)
    val filesBefore = parquetFiles(bandPath).size
    graft.streaming.NearDupStream.compactIndex(spark, idx, numFiles = 4)
    // one file per bp directory, partition dirs preserved
    val dirs = bpDirs(bandPath)
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val n = parquetFiles(s"$bandPath/$d").size
      assert(n == 1, s"$d holds $n files after compaction")
    }
    assert(parquetFiles(bandPath).size < filesBefore,
      "compaction did not reduce the band file count")
    assert(parquetFiles(idx).size == 4)
    assert(probe() == before, "compaction changed probe results")
  }
}
