package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Expectations

/** Continuous data-quality monitoring — the streaming face of
  * [[graft.ops.Expectations]]: every micro-batch is scored by the SAME
  * single-pass expectation suite and appends its
  * `(check, metric, passed, batch_id)` rows to a report table. This is
  * the ingest-time contract monitor a production feed runs alongside
  * curation: a source whose null rate spikes or whose value domain
  * drifts fails visibly IN THE BATCH THAT BROKE IT, with the metric
  * trail persisted per batch for alerting and backfill triage.
  *
  * Per batch the suite is ONE aggregation over the batch (map-side
  * partials, no second scan) plus one small append — nothing rescans
  * prior batches, and the report grows by checks-per-batch, not data.
  * Batch and stream faces share [[Expectations.run]] verbatim, so the
  * per-batch report rows equal the batch-face report over the same
  * slice — which is exactly what the `w_stream_expect` gate pins.
  */
object ExpectStream {

  /** Score one batch into its own `batch_id=<id>` partition directory
    * (Overwrite — a replayed micro-batch rewrites its partition instead
    * of appending duplicate report rows; partition discovery hands the
    * reader `batch_id` back as a column). */
  def reportBatch(batch: DataFrame, checks: Seq[Expectations.Check],
                  outPath: String, batchId: Long): Unit =
    Expectations.run(batch, checks)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$outPath/batch_id=$batchId")

  /** Stream face: `foreachBatch` wiring of [[reportBatch]]. */
  def run(stream: DataFrame, checks: Seq[Expectations.Check],
          outPath: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        reportBatch(batch, checks, outPath, id)
        ()
      }
      .start()
}
