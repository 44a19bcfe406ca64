package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Expectations

/** End-to-end continuous curation — the composition a 100 TB ingest
  * actually runs, as ONE `foreachBatch` pipeline per micro-batch:
  *
  *  1. expectations report ([[graft.ops.Expectations.run]]) over the raw
  *     batch — the quality trail lands FIRST, so rejected feeds are
  *     still observable;
  *  2. curate rules — a caller-supplied pure filter (length floors,
  *     decontamination, language cuts … the `w_stream_curate` shapes);
  *  3. cross-snapshot dedup probe against the persisted fingerprint
  *     index ([[DedupStream.dedupBatch]]) — genuinely-new survivors
  *     append to the curated corpus and fold into the index so every
  *     later batch (this run or the next) dedupes against them;
  *  4. a per-batch metrics row (rows in / past rules / accepted).
  *
  * Each stage is the SAME primitive its standalone gate pins
  * (`w_stream_expect`, `w_stream_curate`, `w_stream_dedup_index`); this
  * operator pins their composition (`w_curate_e2e`): the accepted corpus
  * equals the equivalent batch chain value-exactly.
  *
  * Replay idempotence, stage by stage: reports and metrics write to
  * per-batch partition directories with Overwrite (a replayed batch
  * rewrites its own partition, never duplicates); the corpus/index pair
  * uses [[DedupStream.dedupBatch]]'s batch-partitioned replay-exact
  * discipline — every crash window re-lands identical content, and a
  * full replay returns the batch's TRUE accepted count (its corpus
  * partition's rows), so the rewritten metrics row still sums with the
  * corpus. Scale: per batch, ONE aggregation pass for the report,
  * one filter, one hash-groupBy + anti-join for the probe, small
  * appends — nothing ever rescans prior batches or the accepted corpus.
  */
object CuratePipeline {

  /** Per-batch outcome (also persisted under `metrics/`). */
  final case class BatchMetrics(batchId: Long, nIn: Long, nCurated: Long,
                                nAccepted: Long)

  /** Run ONE batch through the full chain. Layout under `outPath`:
    * `reports/batch_id=<id>/`, `metrics/batch_id=<id>/`, `corpus/`
    * (accepted doc rows, append-only), plus the fingerprint index at
    * `indexPath`. Safe to re-run with the same `batchId` (replay). */
  def curateBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                  checks: Seq[Expectations.Check],
                  rules: DataFrame => DataFrame,
                  indexPath: String, outPath: String,
                  idCol: String = "doc_id",
                  textCol: String = "text"): BatchMetrics = {
    import spark.implicits._
    val staged = batch.persist()
    try {
      Expectations.run(staged, checks)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outPath/reports/batch_id=$batchId")
      val curated = rules(staged).persist()
      try {
        val accepted = DedupStream.dedupBatch(spark, indexPath,
          s"$outPath/corpus", curated, Some(batchId), idCol, textCol)
        val m = BatchMetrics(batchId, staged.count(), curated.count(),
          accepted)
        Seq((m.nIn, m.nCurated, m.nAccepted))
          .toDF("n_in", "n_curated", "n_accepted")
          .coalesce(1)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$outPath/metrics/batch_id=$batchId")
        m
      } finally { curated.unpersist(); () }
    } finally { staged.unpersist(); () }
  }

  /** Stream face: `foreachBatch` wiring of [[curateBatch]], with the
    * maintenance loop CLOSED in-line: `compactEveryBatches = Some(n)`
    * runs [[compactIngest]] at the START of every n-th batch (before
    * that batch's ingest), so the layout never accretes more than n
    * micro-batch file sets before folding back to `compactFiles`
    * sorted files (the s_ivf_rebuild posture — the trigger lives with
    * the ingest, not in a cron no one wires up). Safe where a
    * concurrent OPTIMIZE would not be: `foreachBatch` bodies run
    * serially on the query thread, so the single-writer constraint
    * holds by construction.
    *
    * How this path meets [[compactIngest]]'s contract (whose scaladoc
    * demands a quiesced stream + committed batches — written for the
    * EXTERNAL maintenance entry):
    *
    *  - WRITER side: "quiesced" exists to serialize writers; here the
    *    compaction runs ON the one writer thread, inside its serial
    *    `foreachBatch` body, so the single-writer constraint holds by
    *    construction (stronger than quiescing).
    *  - COMMIT horizon: compaction runs at the START of a batch, BEFORE
    *    that batch's own ingest — and `foreachBatch` for batch n only
    *    executes after batch n−1's checkpoint commit, so every
    *    partition the compaction folds belongs to a COMMITTED batch, by
    *    construction. (A crash mid-batch replays the same batch: the
    *    re-run re-compacts — [[compactIngest]] re-staging the already-
    *    archived layout is content-idempotent — then re-probes and
    *    re-lands identical content, the standard replay discipline.)
    *  - READER side (the one contract this path genuinely RELAXES):
    *    `swapInto` renames the corpus/index directories, so a
    *    CONCURRENT external reader can transiently see a missing
    *    directory mid-swap and must retry (or list-then-read
    *    snapshot-style). In-line compaction is therefore for layouts
    *    whose readers are batch jobs that tolerate a retry; serving
    *    readers that cannot should read through a manifest/catalog
    *    layer or leave `compactEveryBatches = None` and compact in a
    *    maintenance window. */
  def run(stream: DataFrame, checks: Seq[Expectations.Check],
          rules: DataFrame => DataFrame,
          indexPath: String, outPath: String, checkpoint: String,
          idCol: String = "doc_id",
          textCol: String = "text",
          compactEveryBatches: Option[Int] = None,
          compactFiles: Int = 8): StreamingQuery = {
    compactEveryBatches.foreach(n => require(n > 0,
      s"compactEveryBatches must be positive, got $n"))
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // maintenance FIRST: at the start of batch n every partition on
        // disk belongs to a batch whose checkpoint committed (n−1 and
        // earlier), so the fold never touches uncommitted state
        compactEveryBatches.foreach { n =>
          if (id > 0 && id % n == 0)
            compactIngest(batch.sparkSession, indexPath, outPath,
              compactFiles, idCol)
        }
        curateBatch(batch.sparkSession, batch, id, checks, rules,
          indexPath, outPath, idCol, textCol)
        ()
      }
      .start()
  }

  /** OPTIMIZE-style maintenance for the streaming-append layout — the
    * answer to the classic ingest small-file problem: every micro-batch
    * appends one small parquet file set to the corpus partition and the
    * fingerprint index, and after 10⁵ batches a 100 TB corpus scan pays
    * more in file opens than in bytes. This rewrite:
    *
    *  - folds every corpus `batch_id=<k>` partition into ONE archive
    *    partition `batch_id=-1` (a batch id streaming never issues) of
    *    `numFiles` files, in-file sorted by `idCol` — the root stays a
    *    pure partitioned layout, so post-compaction batches keep
    *    appending their own `batch_id=<k>` directories beside it;
    *  - rewrites the fingerprint index to `numFiles` files sorted by
    *    `fingerprint` (tighter row-group min/max for the probe side);
    *  - leaves `reports/` and `metrics/` per-batch partitions UNTOUCHED
    *    — the quality/metrics trail keeps its batch-partition replay
    *    discipline and its full history.
    *
    * Replay discipline after compaction: every compacted fingerprint is
    * still in the index, so a replayed pre-compaction batch probes to
    * zero survivors; its corpus partition is gone, so the zero-survivor
    * path writes NOTHING and reports 0 (see the crash-window note in
    * [[DedupStream.dedupBatch]]). Run compaction only for batches the
    * stream checkpoint has committed (a replay past the compaction
    * horizon is a checkpoint reset, and its metrics row then truthfully
    * records 0 newly-accepted rows), from one maintenance process with
    * the stream quiesced — the [[graft.ops.Layout.compactInPlace]]
    * single-writer constraint; both rewrites stage through a sibling
    * tmp directory and swap by rename.
    *
    * Returns (corpus files, index files) after the rewrite. */
  def compactIngest(spark: SparkSession, indexPath: String,
                    outPath: String, numFiles: Int,
                    idCol: String = "doc_id"): (Long, Long) = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val corpusPath = s"$outPath/corpus"
    // checked rename swaps (rollback on failure, old copy deleted LAST)
    graft.ops.Layout.foldCorpusPartitions(spark, corpusPath, numFiles,
      idCol)
    graft.ops.Layout.compactInPlace(spark, indexPath, numFiles,
      Seq("fingerprint"))
    val fs = graft.core.Fs.fs(spark, corpusPath)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    def nFiles(dir: String): Long = {
      val it = fs.listFiles(p(dir), true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    (nFiles(corpusPath), nFiles(indexPath))
  }

  /** Read-back faces for the persisted layout. */
  def corpus(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/corpus")

  def reports(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/reports")

  def metrics(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(s"$outPath/metrics")
}
