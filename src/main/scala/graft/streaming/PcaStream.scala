package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Pca

/** Continuous covariance/PCA maintenance — the streaming face of
  * [[graft.ops.Pca.foldGram]], the linear-algebra twin of [[CcStream]]:
  * each micro-batch of new embeddings contributes its KB-sized quantized
  * moment-cell matrix, and the current Gram (→ covariance → eigensolve)
  * is always current without ever re-scanning the corpus.
  *
  * Replay idempotence is PROVENANCE-BASED, the [[CuratePipeline]]
  * discipline: each batch writes its OWN `batch_id=<n>` partition of
  * delta cells with a partition-scoped dynamic overwrite, so a crash
  * between the write and the checkpoint commit re-OVERWRITES the same
  * partition on replay — fold-by-addition alone would double-count a
  * replayed batch, which is exactly why the fold happens at READ time
  * ([[readGram]] sums across batch partitions: `batches × cells` rows,
  * KBs at any corpus size) instead of read-modify-write at ingest time.
  * A read-modify-write design would also race concurrent folds; this
  * layout is append-only per batch, single-writer by construction.
  */
object PcaStream {

  /** Start the maintenance loop: every micro-batch of `vecs` (an
    * `idCol`/`vecCol` streaming frame) lands its quantized moment cells
    * under `indexPath/batch_id=<n>/`. */
  def maintainGram(vecs: DataFrame, indexPath: String,
                   vecCol: String = "embedding",
                   scale: Long = 1000000L): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        writeDelta(batch, indexPath, bid, vecCol, scale)
        ()
      }
      .start()

  /** One batch's delta cells → its own partition (replay-idempotent:
    * same batch id, same partition, dynamic overwrite). Exposed for the
    * batch-backfill path (bootstrap the index from a historical corpus
    * with batch_id = -1, then stream forward). */
  def writeDelta(batch: DataFrame, indexPath: String, batchId: Long,
                 vecCol: String = "embedding",
                 scale: Long = 1000000L): Unit =
    Pca.gramExact(batch, vecCol = vecCol, scale = scale)
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(indexPath)

  /** The CURRENT folded Gram: one dimension-domain aggregation over the
    * per-batch partitions — `(i, j, s_xy, n)`, bit-identical to
    * [[graft.ops.Pca.gramExact]] over the union of all ingested
    * batches (integer addition is associative; gated by
    * `w_stream_pca` against the same SQL oracle as `s_pca_gram`). */
  def readGram(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(indexPath)
      .groupBy("i", "j")
      .agg(sum("s_xy").as("s_xy"), sum("n").as("n"))
}
