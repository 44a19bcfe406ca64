package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.SourceContext

/** SURVEY §7.6's incremental-populate seam: Structured-Streaming ingest
  * into a source's tables, built from the two incrementality primitives
  * the reference already has — the A7 anti-join namespace update
  * (namespace_manager.py:272-296) as the per-batch MERGE, and the Action
  * provenance log (models.py:70-113) gaining one row per micro-batch.
  *
  * The batch face ([[mergeBatch]]) and the stream face ([[run]]) share the
  * same code path, so batch-vs-stream equality is testable (StreamingSpec)
  * and the merge itself is oracle-checkable (registered as a harness
  * query). Scale: the merge is one left_anti join against the existing
  * keys (narrow projection of the target table) + an append write — no
  * read-modify-write of existing data, no driver-side state.
  */
object IncrementalPopulate {

  /** Merge one batch into `table`: keep only rows whose key is NOT
    * already present (first writer wins, like the reference's namespace
    * update), dropping batch-internal duplicate keys, then APPEND; one
    * `populate` Action row per batch that lands rows (the reference logs
    * an action per populate invocation — an empty batch is a no-op, not
    * provenance). Returns the number of appended rows. */
  def mergeBatch(ctx: SourceContext, resource: String, table: String,
                 keyCols: Seq[String], batch: DataFrame): Long = {
    // null merge keys are dropped: a null key never matches the anti-join
    // (SQL null semantics), so such rows would re-append on EVERY batch —
    // and the reference's incremental update skips null-keyed entries too
    // (namespace_manager.py:281-285).
    val keyed = keyCols.foldLeft(batch)((df, k) =>
      df.filter(col(k).isNotNull))
    val deduped = keyed.dropDuplicates(keyCols)
    val fresh =
      if (ctx.exists(table))
        deduped.join(
          ctx.read(table).select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
      else deduped
    val staged = fresh.persist()
    try {
      val n = staged.count()
      if (n > 0) {
        ctx.write(table, staged, SaveMode.Append)
        ctx.actions.storePopulate(resource)
      }
      n
    } finally { staged.unpersist(); () }
  }

  /** Stream face: `foreachBatch` wiring of [[mergeBatch]]. Exactly-once
    * per key: replays of a micro-batch after a failure re-run the
    * anti-join, so already-landed keys are not duplicated (the merge is
    * idempotent per key even though the sink is append-only). */
  def run(stream: DataFrame, ctx: SourceContext, resource: String,
          table: String, keyCols: Seq[String],
          checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(ctx, resource, table, keyCols, batch)
        ()
      }
      .start()
}
