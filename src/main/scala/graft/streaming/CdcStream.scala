package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Cdc

/** Streaming CDC maintenance: each micro-batch of changelog rows
  * (op I/U/D + sequence) folds into a persisted snapshot via
  * [[graft.ops.Cdc.applySnapshot]] — the continuous shape of lakehouse
  * MERGE pipelines (a database's CDC feed keeping an analytics replica
  * current). Batch and stream share the fold verbatim, and because each
  * persisted version THREADS the winning sequence and RETAINS delete
  * tombstones, folds compose under arbitrary inter-batch orderings: a
  * later micro-batch delivering an older change (normal for partitioned
  * CDC fan-in) loses to the snapshot row's recorded newer sequence, and
  * an older change behind an already-applied delete cannot resurrect
  * the key. The stream's final [[currentView]] therefore equals the
  * one-shot batch apply over the whole changelog — which is exactly
  * what the `w_stream_cdc` gate pins against the k19 oracle.
  *
  * Snapshots are VERSIONED (`path/v<batchId>`), written whole per batch
  * — a delete must eventually drop rows from the serving view, so
  * unlike the append-only dedup/populate faces this sink rewrites; a
  * version counts as committed only once its `_SUCCESS` marker exists,
  * so a crash mid-write leaves a partial dir that readers and later
  * folds ignore. Replay-safe without any skip logic: a fold always
  * sources the latest COMMITTED version strictly older than its batch
  * id, so a replayed batch re-derives its version from the same
  * predecessor and rewrites identical content. `retain` old versions
  * are kept for concurrent readers and the replay window (foreachBatch
  * replays at most the last uncommitted batch, so retain ≥ 2 always
  * leaves the needed predecessor), older ones vacuumed.
  *
  * Scale: per batch ONE key-shuffle of snapshot ∪ changes (struct-max
  * winner, no window) + one write. At a 100 TB snapshot the production
  * variant partitions the snapshot by key range and rewrites only
  * partitions the batch touches; the fold per partition is this same
  * operator. Tombstones accumulate at the deleted-key rate — production
  * vacuums those older than the feed's out-of-order horizon, the usual
  * compaction-retention dial.
  */
object CdcStream {

  private def fs(spark: SparkSession, path: String) =
    new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed (marker-carrying) version ids, ascending. */
  private def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val hp = new HPath(path)
    if (!f.exists(hp)) Seq.empty
    else f.listStatus(hp).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
          f.exists(new HPath(s"$path/$n/_SUCCESS")) =>
        n.drop(1).toLong }
      .sorted
  }

  /** The latest committed snapshot under `path` (tombstones and the
    * seq/op bookkeeping columns INCLUDED), if any batch landed. */
  def snapshot(spark: SparkSession, path: String): Option[DataFrame] =
    versions(spark, path).lastOption
      .map(v => spark.read.parquet(s"$path/v$v"))

  /** The serving view of the latest snapshot: tombstones filtered, the
    * fold bookkeeping (op, seq) dropped — what a consumer reads. */
  def currentView(spark: SparkSession, path: String): Option[DataFrame] =
    snapshot(spark, path)
      .map(_.filter(col("op") =!= "D").drop("op", "seq"))

  /** Fold one changelog batch into the snapshot chain. `initial` seeds
    * the chain on the first batch (entering at sequence 0 as plain
    * inserts). The fold source is the latest committed version STRICTLY
    * OLDER than `batchId` — never the batch's own version, so a replay
    * cannot overwrite the parquet it is lazily reading (`retain` must
    * cover the replay window, hence the ≥ 2 default). */
  def applyBatch(spark: SparkSession, path: String, initial: DataFrame,
                 batch: DataFrame, keys: Seq[String], batchId: Long,
                 retain: Int = 2): Unit = {
    require(retain >= 2, s"retain must be >= 2 (replay window), got $retain")
    val cur = versions(spark, path).filter(_ < batchId).lastOption
      .map(v => spark.read.parquet(s"$path/v$v"))
      .getOrElse(initial
        .withColumn("op", lit("I")).withColumn("seq", lit(0L)))
    Cdc.applySnapshot(cur, batch, keys, retainTombstones = true)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/v$batchId")
    val f = fs(spark, path)
    versions(spark, path).dropRight(retain).foreach { v =>
      if (v != batchId) { f.delete(new HPath(s"$path/v$v"), true); () }
    }
  }

  /** Stream face: `foreachBatch` wiring of [[applyBatch]]. */
  def run(changes: DataFrame, path: String, initial: DataFrame,
          keys: Seq[String], checkpoint: String): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch.sparkSession, path, initial, batch, keys, id)
        ()
      }
      .start()
}
