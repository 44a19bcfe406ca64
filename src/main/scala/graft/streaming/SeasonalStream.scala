package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Anomaly, Temporal}

/** Streaming face of the seasonal (hour-of-day) anomaly composition —
  * [[graft.ops.Temporal.seasonalProfile]] maintained as a persisted
  * moment table, [[graft.ops.Anomaly.flagSeasonal]] scoring live events
  * against it. Two independent loops, the production shape:
  *
  *  1. PROFILE MAINTENANCE ([[maintainProfile]]): each micro-batch lands
  *     its (key, hod, n, Σq, Σq²) cells in its own `batch_id=<n>`
  *     partition — the [[PcaStream]] provenance discipline verbatim
  *     (moment sums are pure additions, so the fold happens at READ
  *     time and a replayed batch re-overwrites its own partition
  *     instead of double-counting).
  *  2. SCORING ([[scoreStream]]): STATELESS — the folded profile is a
  *     dimension-sized moment table (|keys|·24 rows) broadcast into a
  *     stream-static left join, so the scoring stream needs no state
  *     store, no watermark sealing, no shuffle: one narrow pass per
  *     micro-batch, the same plan shape as the batch face (it IS the
  *     batch face's column logic — [[graft.ops.Anomaly.flagSeasonal]]
  *     is stream-compatible by construction, gated equal in
  *     `w_stream_seasonal`).
  *
  * The baseline an event is scored against is the profile AS OF the
  * scoring stream's start (fold-at-read) — the offline-refresh
  * semantic: restart the scoring query (or re-call [[readProfile]]) on
  * whatever cadence drift demands, the IVF staleness-rebuild
  * discipline. A key/hour never profiled scores `is_outlier = false`
  * (no evidence), the batch face's cold-start contract.
  */
object SeasonalStream {

  /** Start the profile-maintenance loop: every micro-batch of `events`
    * lands its seasonal moment cells under `indexPath/batch_id=<n>/`. */
  def maintainProfile(events: DataFrame, indexPath: String,
                      keyCol: String = "event_type",
                      tsCol: String = "ts",
                      valueCol: String = "value",
                      scale: Long = 1000L): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        writeDelta(batch, indexPath, bid, keyCol, tsCol, valueCol, scale)
        ()
      }
      .start()

  /** One batch's seasonal cells → its own partition (replay-idempotent:
    * same batch id, same partition, dynamic overwrite). Exposed for the
    * batch-backfill path (bootstrap from history with batch_id = -1,
    * then stream forward — the [[PcaStream.writeDelta]] contract). */
  def writeDelta(batch: DataFrame, indexPath: String, batchId: Long,
                 keyCol: String = "event_type", tsCol: String = "ts",
                 valueCol: String = "value",
                 scale: Long = 1000L): Unit =
    Temporal.seasonalProfile(batch, keyCol, tsCol, valueCol, scale)
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(indexPath)

  /** The CURRENT folded profile: one dimension-domain aggregation over
    * the per-batch partitions — bit-identical to
    * [[graft.ops.Temporal.seasonalProfile]] over the union of all
    * ingested batches (integer addition is associative). */
  def readProfile(spark: SparkSession, indexPath: String,
                  keyCol: String = "event_type"): DataFrame =
    spark.read.parquet(indexPath)
      .groupBy(keyCol, "hod")
      .agg(sum("n").as("n"), sum("s").as("s"), sum("ss").as("ss"))

  /** Score a live event stream against a (batch) profile frame:
    * stateless stream-static broadcast join + the decimal(38,0) sigma
    * test — exactly the batch face's columns, on a streaming input. */
  def scoreStream(events: DataFrame, profile: DataFrame, k: Int = 3,
                  minN: Int = 8, scale: Long = 1000L,
                  keyCol: String = "event_type", tsCol: String = "ts",
                  valueCol: String = "value",
                  tieCol: String = "event_id"): DataFrame =
    Anomaly.flagSeasonal(events, profile, k, minN, scale, keyCol, tsCol,
      valueCol, tieCol)
}
