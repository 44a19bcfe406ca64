package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Profile

/** Continuous heavy-hitters maintenance — the streaming face of
  * [[graft.ops.Profile.heavyHitters]], on the [[PcaStream]]/
  * [[SeasonalStream]] provenance discipline: each micro-batch lands its
  * OWN ≤ k-counter Misra–Gries summary in a `batch_id=<n>` partition
  * (replay re-overwrites the same partition), and the current summary
  * folds at READ time.
  *
  * Why the fold is legitimate: MG summaries are MERGEABLE (Agarwal et
  * al., "Mergeable summaries", PODS 2012) — summing per-item estimates
  * across batch summaries and re-compacting to k counters (subtract the
  * (k+1)-th largest, drop non-positives) yields a valid MG summary of
  * the CONCATENATED stream: per-batch errors ≤ nᵢ/(k+1) sum to ≤
  * n/(k+1) total, so the read-time summary keeps the full contract —
  * never over-counts, error ≤ n/(k+1), everything with true count >
  * n/(k+1) present. The fold input is `batches × k` rows (KBs at any
  * corpus size), and the compact runs relationally — one tiny
  * aggregation + a (k+1)-row top slice, no driver collect. */
object HeavyHittersStream {

  /** Start the maintenance loop: every micro-batch's `valueCol` lands
    * its MG summary under `indexPath/batch_id=<n>/`. */
  def maintainSummary(stream: DataFrame, indexPath: String,
                      valueCol: String, k: Int): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        writeDelta(batch, indexPath, bid, valueCol, k)
        ()
      }
      .start()

  /** One batch's MG summary → its own partition (replay-idempotent:
    * same batch id, same partition, dynamic overwrite). Exposed for the
    * batch-backfill path (batch_id = -1, then stream forward). */
  def writeDelta(batch: DataFrame, indexPath: String, batchId: Long,
                 valueCol: String, k: Int): Unit =
    Profile.heavyHitters(batch.withColumn("__g", lit(1)), Seq("__g"),
        valueCol, k)
      .select(explode(col("hits")).as("h"))
      .select(col("h.item").as("item"), col("h.est").as("est"))
      .withColumn("batch_id", lit(batchId))
      .write
      .partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(indexPath)

  /** The CURRENT merged summary: sum per-item estimates across the
    * batch partitions, then one MG compact back to ≤ k counters —
    * subtract the (k+1)-th largest summed estimate from every item and
    * keep the strictly-positive remainder (exactly
    * [[graft.functions.MisraGriesAgg]]'s merge step, run relationally
    * over the dimension-sized fold input). Output: (item, est) sorted
    * nowhere — order like any frame. */
  def readSummary(spark: SparkSession, indexPath: String,
                  k: Int): DataFrame = {
    require(k >= 1, s"heavy-hitters summary needs k >= 1, got $k")
    val summed = spark.read.parquet(indexPath)
      .groupBy("item").agg(sum("est").as("est"))
    val cut = summed.orderBy(col("est").desc, col("item")).limit(k + 1)
      .agg(when(count(lit(1)) > k, min("est")).otherwise(lit(0L))
        .as("__cut"))
    summed.crossJoin(cut)
      .filter(col("est") > col("__cut"))
      .select(col("item"), (col("est") - col("__cut")).as("est"))
  }
}
