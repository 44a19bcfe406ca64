package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Dedup

/** Streaming cross-snapshot exact dedup: each micro-batch of documents is
  * probed against the PERSISTED fingerprint index
  * ([[graft.ops.Dedup.writeFingerprintIndex]]), its genuinely-new
  * survivors land in the curated output, and their fingerprints fold into
  * the index so every LATER batch — in this stream or a future run —
  * dedupes against them. This is the continuous-ingest shape of corpus
  * curation (a crawler feeding a training corpus dedupes each dump
  * against everything already accepted), sharing the batch-face
  * primitives verbatim, so batch-vs-stream equality is testable and the
  * harness gates it against a pure-SQL oracle (`w_stream_dedup_index`).
  *
  * Idempotence on micro-batch REPLAY: with a `batchId` (the stream
  * face always passes one), survivor rows land in their own
  * `batch_id=<id>` partition directory, which closes EVERY crash
  * window exactly-once:
  *  - crash before any write → replay recomputes the same survivors
  *    (same batch, same index state) and lands them;
  *  - crash between the corpus write and the index append → replay's
  *    probe still reports the docs novel (their fingerprints never
  *    indexed) and the partition OVERWRITE replaces the identical
  *    rows instead of appending duplicates, then the index append
  *    completes;
  *  - crash after the index append (before the checkpoint commit) →
  *    replay's probe reports nothing novel, the existing partition is
  *    KEPT (never overwritten with empty), and the partition's row
  *    count is returned so accounting stays truthful.
  * Without a batchId (ad-hoc batch use) the corpus append is plain
  * append-only and only the probe-first content guarantee holds —
  * callers that may replay should pass the id. The corpus directory
  * and the stream checkpoint share a lifecycle (a fresh checkpoint
  * against an old output directory restarts batch ids at 0 — the same
  * contract as every per-batch-partition sink here).
  *
  * Scale: per batch one hash-groupBy of the batch + one anti-join on the
  * fingerprint key (broadcast when the index is small, shuffle-on-key
  * otherwise) + two appends. The index grows by the novel-content rate
  * only; nothing ever rescans the accepted corpus.
  */
object DedupStream {

  private def exists(spark: SparkSession, path: String): Boolean =
    graft.core.Fs.exists(spark, path)

  /** Probe-and-fold one batch: novel survivor DOC rows (full schema)
    * land under `outPath`, their index rows append to `indexPath`
    * (created on first batch). With a `batchId` the corpus write is the
    * replay-exact partition discipline documented above; without one it
    * is plain append. Returns the number of accepted documents — on a
    * full replay, the batch's TRUE accepted count (its partition's
    * rows), never a misleading 0. */
  def dedupBatch(spark: SparkSession, indexPath: String, outPath: String,
                 batch: DataFrame, batchId: Option[Long] = None,
                 idCol: String = "doc_id",
                 textCol: String = "text"): Long = {
    val fresh = (if (exists(spark, indexPath))
      Dedup.incrementalSurvivors(spark, indexPath, batch, idCol, textCol)
    else Dedup.exactSurvivors(batch, idCol, textCol)).persist()
    try {
      val n = fresh.count()
      val docs = batch.join(fresh.select(col("survivor_id").as(idCol)),
        Seq(idCol), "left_semi")
      batchId match {
        case Some(id) =>
          val part = s"$outPath/batch_id=$id"
          if (n > 0) {
            if (exists(spark, part)) {
              // replay after a PARTIALLY committed index append (a
              // non-atomic committer / object-store rename can land a
              // subset of the fingerprint files before the crash): the
              // probe then recomputes only the not-yet-indexed subset
              // of survivors, and a bare Overwrite would replace the
              // previously-landed FULL set with that subset. Union the
              // recomputed survivors with the partition rows THIS
              // pipeline accepted — membership = fingerprint present in
              // the current index, so a stale partition left by an old
              // run against a fresh index contributes nothing (the
              // plain-Overwrite truth semantics) while every partially-
              // indexed row survives. Staged through a sibling tmp dir
              // (parquet can't overwrite its own input) and swapped by
              // CHECKED renames with the old copy deleted last
              // (Layout.swapInto) — no crash window loses the landed
              // rows. dropDuplicates on idCol keeps the overlap single.
              val tmp = s"$outPath/.batch_id=${id}_replay_tmp"
              graft.core.Fs.delete(spark, tmp)
              // no index at all (the corpus-write-then-crash window
              // lost it entirely): the probe recomputed the FULL
              // survivor set, so `docs` alone is the truth
              val landedKept =
                if (exists(spark, indexPath)) {
                  val indexed = spark.read.parquet(indexPath)
                    .select(col("fingerprint").as("__fp"))
                  spark.read.parquet(part)
                    .withColumn("__fp",
                      graft.ops.TextAnalysis.fingerprint(col(textCol)))
                    .join(indexed, Seq("__fp"), "left_semi")
                    .drop("__fp")
                } else docs.limit(0)
              docs.unionByName(landedKept, allowMissingColumns = true)
                .dropDuplicates(idCol)
                .write.mode(SaveMode.Overwrite).parquet(tmp)
              graft.ops.Layout.swapInto(spark, part, tmp)
              fresh.write.mode(SaveMode.Append).parquet(indexPath)
              spark.read.parquet(part).count()
            } else {
              // first processing of this batch: write the partition,
              // THEN append the index (probe-before-append replay
              // discipline)
              docs.write.mode(SaveMode.Overwrite).parquet(part)
              fresh.write.mode(SaveMode.Append).parquet(indexPath)
              n
            }
          } else if (exists(spark, part)) {
            // full replay after the index append: keep the landed rows
            // and report their true count
            spark.read.parquet(part).count()
          } else 0L
        case None =>
          if (n > 0) {
            docs.write.mode(SaveMode.Append).parquet(outPath)
            fresh.write.mode(SaveMode.Append).parquet(indexPath)
          }
          n
      }
    } finally { fresh.unpersist(); () }
  }

  /** Stream face: `foreachBatch` wiring of [[dedupBatch]], batch ids
    * threaded through for the replay-exact corpus layout. */
  def run(stream: DataFrame, indexPath: String, outPath: String,
          checkpoint: String, idCol: String = "doc_id",
          textCol: String = "text"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        dedupBatch(batch.sparkSession, indexPath, outPath, batch,
          Some(id), idCol, textCol)
        ()
      }
      .start()
}
