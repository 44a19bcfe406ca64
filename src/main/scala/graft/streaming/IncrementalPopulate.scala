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
  * query).
  *
  * Scale: the merge is one left_anti join against the existing keys
  * (narrow projection of the target table) + an append write — no
  * read-modify-write of existing data, no driver-side state. With
  * `buckets > 0` the target is maintained as a BUCKETED catalog table
  * hash-clustered on the merge keys, so the anti-join's existing-keys
  * side is scanned key-column-only and NEVER shuffled (its scan already
  * satisfies the join's required HashPartitioning); the per-batch shuffle
  * carries only the incoming batch. At a 100 TB target the unbucketed
  * merge re-shuffles every existing key on every micro-batch — the
  * bucketed layout is the production shape.
  */
object IncrementalPopulate {

  /** The not-yet-present rows of `batch`: null-keyed rows dropped (a null
    * key never matches the anti-join, so such rows would re-append on
    * EVERY batch — and the reference's incremental update skips
    * null-keyed entries too, namespace_manager.py:281-285), batch-internal
    * duplicate keys deduped, then one left_anti join against the existing
    * keys. Exposed so plan tests can assert the bucketed anti-join shape
    * (no exchange on the existing-keys side). */
  private[graft] def freshRows(ctx: SourceContext, table: String,
                               keyCols: Seq[String], batch: DataFrame,
                               buckets: Int): DataFrame = {
    val keyed = keyCols.foldLeft(batch)((df, k) =>
      df.filter(col(k).isNotNull))
    val deduped = keyed.dropDuplicates(keyCols)
    existingKeys(ctx, table, keyCols, buckets) match {
      case Some(keys) => deduped.join(keys, keyCols, "left_anti")
      case None => deduped
    }
  }

  /** Existing merge keys of the target, or None when the target is empty.
    * Bucketed targets read through the session catalog (bucket specs live
    * there, not in parquet footers) so the scan exposes its
    * HashPartitioning to the planner. A catalog entry whose files were
    * wiped out-of-band is dropped and treated as empty; a path populated
    * BEFORE bucketing was turned on is still honored via the plain read. */
  private def existingKeys(ctx: SourceContext, table: String,
                           keyCols: Seq[String],
                           buckets: Int): Option[DataFrame] = {
    def keysOf(df: DataFrame) = df.select(keyCols.map(col): _*).distinct()
    if (buckets > 0) {
      val cat = ctx.catalogName(table)
      val registered = ctx.spark.catalog.tableExists(cat)
      if (registered && !ctx.exists(table)) {
        ctx.spark.sql(s"DROP TABLE IF EXISTS $cat")
        None
      } else if (registered) Some(keysOf(ctx.spark.table(cat)))
      else if (ctx.exists(table)) Some(keysOf(ctx.read(table)))
      else None
    } else if (ctx.exists(table)) Some(keysOf(ctx.read(table)))
    else None
  }

  /** Merge one batch into `table`: keep only rows whose key is NOT
    * already present (first writer wins, like the reference's namespace
    * update), dropping batch-internal duplicate keys, then APPEND; one
    * `populate` Action row per batch that lands rows (the reference logs
    * an action per populate invocation — an empty batch is a no-op, not
    * provenance). With `buckets > 0` the append maintains the target as a
    * bucketed catalog table clustered on `keyCols` (see class doc).
    * Returns the number of appended rows. */
  def mergeBatch(ctx: SourceContext, resource: String, table: String,
                 keyCols: Seq[String], batch: DataFrame,
                 buckets: Int = 0): Long = {
    val staged = freshRows(ctx, table, keyCols, batch, buckets).persist()
    try {
      val n = staged.count()
      if (n > 0) {
        if (buckets > 0)
          staged.write.mode(SaveMode.Append)
            .format("parquet")
            .option("path", ctx.pathOf(table))
            .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
            .sortBy(keyCols.head, keyCols.tail: _*)
            .saveAsTable(ctx.catalogName(table))
        else ctx.write(table, staged, SaveMode.Append)
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
          checkpoint: String, buckets: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(ctx, resource, table, keyCols, batch, buckets)
        ()
      }
      .start()
}
