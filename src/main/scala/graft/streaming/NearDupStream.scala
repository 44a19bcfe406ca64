package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.Checkpoints
import graft.ops.Dedup

/** Streaming cross-snapshot NEAR-dup curation — the MinHash twin of
  * [[DedupStream]]: each micro-batch of documents is (1) blanketed
  * within itself ("dominated-by-earlier": a doc is dropped iff SOME
  * smaller-id doc in the same batch has exact n-gram Jaccard ≥
  * `threshold` with it — the [[graft.ops.Dedup.semanticSurvivors]]
  * non-chained rule, so the whole chain stays SQL-expressible), then
  * (2) probed against the PERSISTED banded MinHash index
  * ([[graft.ops.Dedup.writeMinHashIndex]] layout) and dropped on any
  * verified hit, and (3) the genuinely-novel survivors land in the
  * curated output with their `(id, shingles, sig)` rows folded into the
  * index so every later batch — in this stream or a future run —
  * near-dedupes against them. A continuously-ingesting crawl pipeline
  * near-dedupes incrementally; this is that loop, from the same
  * primitives as the batch chain (`d_incremental_minhash`), so
  * batch-vs-stream equality is testable and the harness gates it
  * against a pure-SQL oracle (`w_stream_neardup`).
  *
  * Candidates come from the band equi-join and are verified with EXACT
  * Jaccard from the stored shingle sets — no LSH false positives in any
  * drop decision; the banding miss probability at the 0.8/32/3 defaults
  * is ~5e-10 (the [[graft.ops.Dedup.incrementalNearDups]] analysis).
  *
  * Replay idempotence is CONTENT-anchored: a replayed batch's docs probe
  * against their own previously-appended signatures (exact self-match,
  * Jaccard 1), so nothing novel is recomputed and nothing re-appends —
  * the probe-before-append discipline closes the crash windows the same
  * way [[DedupStream]] does, with index membership tested on the doc id
  * (the index row's id IS the accepted doc's id). The index append is
  * TWO layouts — band rows first, then signature rows
  * ([[graft.ops.Dedup.appendMinHashIndexRows]]) — ordered so a landed
  * signature always has its band rows on disk and therefore always
  * self-matches on replay; the windows:
  *  - crash before any write → full recompute, identical survivors;
  *  - crash between the corpus write and the index append (possibly
  *    with a SUBSET of band files landed — duplicate band rows are
  *    harmless, candidates dedup on the pair) → replay recomputes the
  *    not-yet-indexed survivors and unions them with the partition rows
  *    whose ids the index already holds, swapped in atomically
  *    ([[graft.ops.Layout.swapInto]]);
  *  - crash after the index append → the probe reports nothing novel,
  *    the landed partition is KEPT and its true count returned.
  *
  * Scale: per batch the staging (shingle + signature) is narrow and
  * batch-sized; band rows are (id, band, bucket) on both sides, and the
  * index side reads the PERSISTED bucket-partitioned band layout with
  * the scan pruned to the batch's own bp partitions — per-batch probe
  * cost scales with the batch, not the index (the
  * [[graft.ops.Dedup.probeNearDups]] contract); the index's shingle
  * arrays are touched only for collided candidate ids; the index grows
  * by the novel-content rate only and is never self-joined or fully
  * rescanned. [[compactIndex]] is the small-file maintenance entry
  * (thousands of micro-batches otherwise mean thousands of files on
  * the hottest probe surface).
  */
object NearDupStream {

  private def exists(spark: SparkSession, path: String): Boolean =
    graft.core.Fs.exists(spark, path)

  /** Blanket-within-batch, probe, land, fold — one batch. Returns the
    * number of accepted documents (on a full replay, the batch's TRUE
    * accepted count — its partition's rows — never a misleading 0). */
  def nearDupBatch(spark: SparkSession, indexPath: String, outPath: String,
                   batch: DataFrame, batchId: Option[Long] = None,
                   n: Int = 3, threshold: Double = 0.8,
                   bands: Int = 32, rowsPerBand: Int = 3,
                   idCol: String = "doc_id",
                   textCol: String = "text"): Long = {
    val staged = Checkpoints.cut(
      Dedup.shingled(batch, n, idCol, textCol)
        .withColumn("sig",
          Dedup.minHashSignature(col("shingles"), bands * rowsPerBand)))
      .persist()
    try {
      // (1) within-batch dominated-by-earlier blanket: LSH candidates
      // (id_a < id_b), exact-Jaccard verified, larger id dropped
      val cand = Dedup.bandRows(staged, bands, rowsPerBand).alias("a")
        .join(Dedup.bandRows(staged, bands, rowsPerBand).alias("b"),
          col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      val dominated = cand
        .join(staged.select(col("id").as("id_a"),
          col("shingles").as("sh_a")), "id_a")
        .join(staged.select(col("id").as("id_b"),
          col("shingles").as("sh_b")), "id_b")
        .withColumn("nc",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .filter(col("nc").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("nc"))
            .cast("double") >= threshold)
        .select(col("id_b").as("id")).distinct()
      val inBatch = staged.join(dominated, Seq("id"), "left_anti")
      // (2) cross-index probe on the already-staged survivors —
      // partition-pruned against the persisted band layout
      val fresh = (if (exists(spark, indexPath)) {
        val hits = Dedup.probeNearDups(spark, inBatch,
            indexPath, threshold, bands, rowsPerBand)
          .select("id").distinct()
        inBatch.join(hits, Seq("id"), "left_anti")
      } else inBatch).persist()
      val nNew = fresh.count()
      val docs = batch.join(fresh.select(col("id").as(idCol)),
        Seq(idCol), "left_semi")
      // (3) land + fold, the DedupStream replay discipline
      val accepted = batchId match {
        case Some(id) =>
          val part = s"$outPath/batch_id=$id"
          if (nNew > 0) {
            if (exists(spark, part)) {
              // replay after a partially-committed index append: keep
              // the partition rows the index already holds (id
              // membership — a stale partition from an old run against
              // a fresh index contributes nothing), union the
              // recomputed not-yet-indexed survivors, swap atomically
              val tmp = s"$outPath/.batch_id=${id}_replay_tmp"
              graft.core.Fs.delete(spark, tmp)
              val landedKept =
                if (exists(spark, indexPath)) {
                  val idxIds = spark.read.parquet(indexPath)
                    .select(col("id").as(idCol))
                  spark.read.parquet(part)
                    .join(idxIds, Seq(idCol), "left_semi")
                } else docs.limit(0)
              docs.unionByName(landedKept, allowMissingColumns = true)
                .dropDuplicates(idCol)
                .write.mode(SaveMode.Overwrite).parquet(tmp)
              graft.ops.Layout.swapInto(spark, part, tmp)
              Dedup.appendMinHashIndexRows(spark, indexPath, fresh,
                bands, rowsPerBand)
              spark.read.parquet(part).count()
            } else {
              docs.write.mode(SaveMode.Overwrite).parquet(part)
              Dedup.appendMinHashIndexRows(spark, indexPath, fresh,
                bands, rowsPerBand)
              nNew
            }
          } else if (exists(spark, part)) {
            spark.read.parquet(part).count()
          } else 0L
        case None =>
          if (nNew > 0) {
            docs.write.mode(SaveMode.Append).parquet(outPath)
            Dedup.appendMinHashIndexRows(spark, indexPath, fresh,
              bands, rowsPerBand)
          }
          nNew
      }
      fresh.unpersist()
      accepted
    } finally { staged.unpersist(); () }
  }

  /** OPTIMIZE-style maintenance for the near-dup index pair — the
    * signature-index twin of
    * [[CuratePipeline.compactIngest]]'s exact-index rewrite: every
    * micro-batch appends one small file set to the signature layout AND
    * one per touched `bp` partition to the band layout, so after 10⁴
    * batches the hottest probe surface pays more in file opens than in
    * bytes. This rewrite:
    *
    *  - compacts the SIGNATURE layout to `numFiles` files, in-file
    *    sorted by `id` (tight row-group min/max for the candidate-id
    *    shingle fetch);
    *  - compacts the BAND layout to ONE file per `bp` partition, rows
    *    sorted by (bucket, band, id) — partition-pruning semantics are
    *    untouched (same directories), and any crash-window duplicate
    *    band rows are carried verbatim (content-preserving rewrite;
    *    they stay harmless — candidates dedup on the pair).
    *
    * Probe results are IDENTICAL before and after (same rows, tighter
    * files — spec-pinned), and a replayed pre-compaction batch still
    * self-matches everything it appended (every signature and band row
    * survives the fold), so it lands nothing. Single-writer: run with
    * the stream quiesced, or from the serial `foreachBatch` thread
    * (the [[CuratePipeline.run]] in-line analysis applies verbatim). */
  def compactIndex(spark: SparkSession, indexPath: String,
                   numFiles: Int = 8): Unit = {
    graft.ops.Layout.compactInPlace(spark, indexPath, numFiles, Seq("id"))
    val bandPath = graft.ops.Dedup.bandLayoutPath(indexPath)
    if (exists(spark, bandPath))
      graft.ops.Layout.compactPartitionedInPlace(spark, bandPath,
        Seq("bucket", "band", "id"))
  }

  /** Full ingest maintenance: fold the corpus's per-batch partitions
    * into the `batch_id=-1` archive (the [[CuratePipeline.compactIngest]]
    * corpus discipline — replayed pre-compaction batches probe to zero
    * and land nothing) and compact both index layouts
    * ([[compactIndex]]). */
  def compactIngest(spark: SparkSession, indexPath: String,
                    outPath: String, numFiles: Int = 8,
                    idCol: String = "doc_id"): Unit = {
    graft.ops.Layout.foldCorpusPartitions(spark, outPath, numFiles, idCol)
    compactIndex(spark, indexPath, numFiles)
  }

  /** Stream face: `foreachBatch` wiring of [[nearDupBatch]], batch ids
    * threaded through for the replay-exact corpus layout. */
  def run(stream: DataFrame, indexPath: String, outPath: String,
          checkpoint: String, n: Int = 3, threshold: Double = 0.8,
          bands: Int = 32, rowsPerBand: Int = 3,
          idCol: String = "doc_id",
          textCol: String = "text",
          compactEveryBatches: Option[Int] = None,
          compactFiles: Int = 8): StreamingQuery = {
    compactEveryBatches.foreach(nb => require(nb > 0,
      s"compactEveryBatches must be positive, got $nb"))
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // maintenance FIRST, on the serial foreachBatch thread — the
        // CuratePipeline.run single-writer/commit-horizon analysis
        compactEveryBatches.foreach { nb =>
          if (id > 0 && id % nb == 0 &&
              exists(batch.sparkSession, indexPath))
            compactIngest(batch.sparkSession, indexPath, outPath,
              compactFiles, idCol)
        }
        nearDupBatch(batch.sparkSession, indexPath, outPath, batch,
          Some(id), n, threshold, bands, rowsPerBand, idCol, textCol)
        ()
      }
      .start()
  }
}
