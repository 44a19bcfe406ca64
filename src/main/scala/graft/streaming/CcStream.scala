package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.bel.{ConnectedComponents, IncrementalCC}

/** Continuous connected-components maintenance — the streaming face of
  * the persisted label index ([[graft.bel.IncrementalCC.foldIndex]]),
  * the graph twin of [[DedupStream]]: each micro-batch of NEW EDGES
  * folds into the bucket-partitioned on-disk index, so the component
  * labels are always current without ever re-running the star loop over
  * the full edge history. This is how a 100 TB entity graph (duplicate
  * clusters, citation links, resolved identities) stays labeled under
  * continuous ingest: per batch, two delta-sized index probes + the
  * star fixpoint over the touched-component SUPER-graph only, then a
  * touched-buckets-only partition overwrite.
  *
  * Replay idempotence rides the fold's own semantics: re-folding an
  * already-folded edge batch maps every endpoint to its existing
  * component, the super-graph canonicalizes to nothing, and ZERO
  * buckets rewrite (the IncrementalCCSpec all-duplicate case) — so a
  * crash between the index write and the checkpoint commit re-lands
  * nothing on replay. Labels after any prefix of batches are
  * bit-identical to a from-scratch run over the union of those batches
  * (fold composition, gated by `w_stream_cc` against the same oracle
  * as the batch-face `a28_cc_index_persist` — the k19/w_stream_cdc
  * one-oracle-two-faces discipline).
  */
object CcStream {

  /** Fold one edge batch into the index at `indexPath` (created from the
    * batch itself on first sight). Returns the number of bucket
    * directories actually written — on creation the count of DISTINCT
    * buckets the base components hash into (≤ the nominal modulus), on
    * a fold the rewritten-bucket count (0 for a no-op/replayed batch).
    *
    * "Index exists" is decided by the layout's bucket-count marker —
    * which [[IncrementalCC.writeIndex]] writes LAST, so it doubles as
    * the commit record: a crash mid-creation leaves a marker-less
    * partial directory, and the replayed batch re-CREATES (Overwrite
    * cleans the debris) instead of folding a delta into garbage. A bare
    * directory-existence check would conflate "present" with
    * "committed". */
  def foldBatch(spark: SparkSession, indexPath: String, batch: DataFrame,
                buckets: Int = 64): Long =
    IncrementalCC.readBucketCount(spark, indexPath) match {
      case None =>
        IncrementalCC.writeIndex(ConnectedComponents.run(batch), indexPath,
          buckets)
        // truthful accounting, same contract as foldIndex: the number of
        // bucket directories actually WRITTEN, not the nominal modulus —
        // a base graph whose components hash into fewer than `buckets`
        // distinct buckets writes fewer directories. `bucket` is the
        // PARTITION column, so this distinct-count is a metadata-only
        // scan (directory listing), no data files open.
        spark.read.parquet(indexPath)
          .select("bucket").distinct().count()
      case Some(_) =>
        IncrementalCC.foldIndex(spark, indexPath, batch, buckets)
    }

  /** Stream face: `foreachBatch` wiring of [[foldBatch]] over an edge
    * stream with `src`/`dst` columns. */
  def run(stream: DataFrame, indexPath: String, checkpoint: String,
          buckets: Int = 64): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        foldBatch(batch.sparkSession, indexPath, batch, buckets)
        ()
      }
      .start()
}
