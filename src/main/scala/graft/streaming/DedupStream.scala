package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
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
  * Idempotence on micro-batch REPLAY: a replayed batch re-runs the
  * anti-join against an index that already holds its fingerprints, so
  * nothing re-lands — exactly-once per CONTENT even though both sinks
  * are append-only. (A crash between the two appends of one batch can
  * drop the index entry for an already-emitted doc until the replay
  * re-appends it; replays re-emit nothing because the probe runs against
  * the index FIRST and the index append is last.)
  *
  * Scale: per batch one hash-groupBy of the batch + one anti-join on the
  * fingerprint key (broadcast when the index is small, shuffle-on-key
  * otherwise) + two appends. The index grows by the novel-content rate
  * only; nothing ever rescans the accepted corpus.
  */
object DedupStream {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val hp = new HPath(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Probe-and-fold one batch: novel survivor DOC rows (full schema)
    * append to `outPath`, their index rows to `indexPath` (created on
    * first batch). Returns the number of accepted documents. */
  def dedupBatch(spark: SparkSession, indexPath: String, outPath: String,
                 batch: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): Long = {
    val fresh = (if (exists(spark, indexPath))
      Dedup.incrementalSurvivors(spark, indexPath, batch, idCol, textCol)
    else Dedup.exactSurvivors(batch, idCol, textCol)).persist()
    try {
      val n = fresh.count()
      if (n > 0) {
        batch.join(fresh.select(col("survivor_id").as(idCol)),
            Seq(idCol), "left_semi")
          .write.mode(SaveMode.Append).parquet(outPath)
        fresh.write.mode(SaveMode.Append).parquet(indexPath)
      }
      n
    } finally { fresh.unpersist(); () }
  }

  /** Stream face: `foreachBatch` wiring of [[dedupBatch]]. */
  def run(stream: DataFrame, indexPath: String, outPath: String,
          checkpoint: String, idCol: String = "doc_id",
          textCol: String = "text"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupBatch(batch.sparkSession, indexPath, outPath, batch,
          idCol, textCol)
        ()
      }
      .start()
}
