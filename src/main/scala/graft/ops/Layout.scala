package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical data-layout tools — the warehouse hygiene a 100 TB corpus
  * needs between logical operators (the reference's write surface stops
  * at whole-file exports, `io/automate.py:30-46`; at scale the LAYOUT of
  * what is written is itself an operator):
  *
  *  - [[compact]]: rewrite a parquet directory into a fixed number of
  *    files, each internally sorted. Streaming ingestion and incremental
  *    appends accrete small files (one per micro-batch/task) whose
  *    per-file open cost dominates scans long before data size does; the
  *    in-file sort additionally tightens parquet row-group min/max stats
  *    so point/range predicates prune row groups, not just partitions.
  *  - [[exportJsonl]]: loader-facing gzipped JSON-Lines shards — the
  *    interchange format training loaders and labeling tools consume.
  *    One file per shard, shard assignment by Spark's round-robin
  *    repartition; downstream tooling streams each shard independently.
  *
  * Both are thin by design: the value is the declared layout contract
  * (file count, in-file order, codec), not cleverness — and both go
  * through the normal `DataFrameWriter` path so they inherit the
  * committer's atomicity (no partial directories on failure).
  */
object Layout {

  /** Rewrite `in` (parquet) as exactly `numFiles` files at `out`, rows
    * inside each file sorted by `sortCols`. Content is preserved
    * row-for-row (a pure repartition + in-partition sort — no dedup, no
    * filter). Returns the re-read frame for chaining/validation. */
  def compact(spark: SparkSession, in: String, out: String,
              numFiles: Int, sortCols: Seq[String]): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(sortCols.nonEmpty, "compact needs at least one sort column")
    spark.read.parquet(in)
      .repartition(numFiles)
      .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite).parquet(out)
    spark.read.parquet(out)
  }

  /** Write `df` as `shards` gzipped JSON-Lines files under `out`.
    * Returns the re-read frame (schema-pinned to `df`'s — JSON carries
    * no types, so the reader must never infer). */
  def exportJsonl(df: DataFrame, out: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.repartition(shards)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "gzip")
      .json(out)
    df.sparkSession.read.schema(df.schema).json(out)
  }
}
