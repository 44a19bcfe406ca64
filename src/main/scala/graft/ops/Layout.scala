package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) code: bit-interleave of two non-negative columns,
    * each truncated to `bits` low bits — the multi-dimensional
    * clustering key behind Z-ordered lakehouse layouts. Points close in
    * BOTH dimensions get close codes, so sorting by the code co-locates
    * them in the same parquet row groups and min/max stats prune range
    * predicates on EITHER column — the property a single-column sort
    * cannot give. Pure integer arithmetic (shift/and/or), bit-identical
    * in any engine. Operands are widened to LONG before interleaving:
    * int inputs would otherwise hit Spark's shift-amount mod-32 masking
    * past bit 31 (2·i+1 reaches 61 at bits = 31) and overflow the
    * 32-bit OR-reduce — the widening makes every `bits` ≤ 31 exact. */
  def mortonCode(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** [[compact]]'s multi-dimensional sibling: rewrite `in` as `numFiles`
    * files RANGE-partitioned and internally sorted by the Morton code of
    * (`colA` % 2^bits, `colB` % 2^bits). Content preserved row-for-row;
    * the interleave column is computed for layout only and not written. */
  def zorderCompact(spark: SparkSession, in: String, out: String,
                    numFiles: Int, colA: String, colB: String,
                    bits: Int = 8): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val mask = (1 << bits) - 1
    val df = spark.read.parquet(in)
    df.withColumn("__z", mortonCode(
        col(colA).bitwiseAND(lit(mask)), col(colB).bitwiseAND(lit(mask)),
        bits))
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
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
