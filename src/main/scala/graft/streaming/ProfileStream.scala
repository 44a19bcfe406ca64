package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Profile

/** Continuous cardinality profiling — the streaming face of
  * [[graft.ops.Profile.hllStates]]/[[graft.ops.Profile.mergeHllStates]],
  * completing the fold-at-read family ([[PcaStream]] moments,
  * [[SeasonalStream]] seasonal cells, [[HeavyHittersStream]] MG
  * counters): each micro-batch lands its per-key HLL sketch states and
  * exact row counts in its own `batch_id=<n>` partition (replay
  * re-overwrites), and current per-key cardinality estimates fold at
  * READ time.
  *
  * Why the fold is EXACT-equal to a one-shot profile (stronger than the
  * MG case, gated in `w_stream_profile`): an HLL sketch's registers are
  * per-bucket MAXIMA of hashed-value rank — insertion-order-independent
  * and idempotent — so the union of per-batch sketches over a
  * partitioned stream IS the sketch of the whole stream, register for
  * register; the folded estimate equals the one-shot estimate exactly,
  * and the exact row counts sum alongside. Fold input is
  * `batches × keys` KB-sized state blobs, never the corpus. */
object ProfileStream {

  /** Start the maintenance loop: every micro-batch's (key, id) pairs
    * land their sketch states under `indexPath/batch_id=<n>/`. */
  def maintainStates(events: DataFrame, indexPath: String,
                     keyCol: String, idCol: String,
                     lgK: Int = 12): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        writeDelta(batch, indexPath, bid, keyCol, idCol, lgK)
        ()
      }
      .start()

  /** One batch's sketch states → its own partition (replay-idempotent:
    * same batch id, same partition, dynamic overwrite). Exposed for the
    * batch-backfill path (batch_id = -1, then stream forward). */
  def writeDelta(batch: DataFrame, indexPath: String, batchId: Long,
                 keyCol: String, idCol: String, lgK: Int = 12): Unit =
    Profile.hllStates(batch, keyCol, idCol, lgK)
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(indexPath)

  /** The CURRENT folded per-key estimates: one dimension-domain sketch
    * union over the batch partitions — `(keyCol, n_distinct_approx,
    * n)`, estimate-identical to a one-shot [[graft.ops.Profile
    * .hllStates]]+merge over the union of all ingested batches. */
  def readEstimates(spark: SparkSession, indexPath: String,
                    keyCol: String): DataFrame =
    Profile.mergeHllStates(spark.read.parquet(indexPath), keyCol)

  // ---- KLL quantile face ----------------------------------------------------

  /** Start the QUANTILE maintenance loop — the KLL face of this stream
    * (completing the fold-at-read sketch family: HLL cardinalities, MG
    * heavy hitters, Gram/moment matrices, and now quantiles): every
    * micro-batch lands its per-key KLL sketch states
    * ([[graft.ops.Profile.kllStates]]) under `indexPath/batch_id=<n>/`.
    * KLL is mergeable, so the read-time fold is a valid summary of the
    * WHOLE feed carrying the one-shot rank-error bound — but unlike the
    * HLL face it is not state-identical to a one-shot sketch (merge
    * order shifts compaction), so its gate (`w_stream_quantiles`)
    * checks the a15 rank-error contract against exact percentiles of
    * the full feed rather than face equality. Stream-time quality-band
    * thresholds (`t_quality_band`'s posture) read from this index. */
  def maintainQuantileStates(events: DataFrame, indexPath: String,
                             keyCol: String, valueCol: String,
                             k: Int = 2048): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        writeQuantileDelta(batch, indexPath, bid, keyCol, valueCol, k)
        ()
      }
      .start()

  /** One batch's KLL states → its own partition (replay-idempotent:
    * same batch id, same partition, dynamic overwrite). Exposed for the
    * batch-backfill path (batch_id = -1, then stream forward). */
  def writeQuantileDelta(batch: DataFrame, indexPath: String,
                         batchId: Long, keyCol: String, valueCol: String,
                         k: Int = 2048): Unit =
    Profile.kllStates(batch, keyCol, valueCol, k)
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(indexPath)

  /** The CURRENT folded per-key quantile estimates: one merge fold over
    * the batch partitions — `(keyCol, p<rank>_approx…, n)`. Fold input
    * is `batches × keys` KB-sized state blobs, never the corpus. */
  def readQuantiles(spark: SparkSession, indexPath: String, keyCol: String,
                    quantiles: Seq[Double] = Seq(0.5, 0.95)): DataFrame =
    Profile.mergeKllStates(spark.read.parquet(indexPath), keyCol, quantiles)
}
