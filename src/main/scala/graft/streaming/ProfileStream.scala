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
}
