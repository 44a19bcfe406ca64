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
  def mortonCode(a: Column, b: Column, bits: Int = 8): Column =
    mortonCodeN(Seq(a, b), bits)

  /** N-column Morton interleave: bit `i` of column `c` lands at position
    * `n·i + c`, so the 2-column [[mortonCode]] is exactly the `n = 2`
    * case. `n · bits` must stay ≤ 63 (the sign bit never participates —
    * codes order as non-negative longs); operands widen to LONG first
    * for the same shift-masking reason as the 2-column form. */
  def mortonCodeN(cols: Seq[Column], bits: Int = 8): Column = {
    val n = cols.length
    require(n >= 2, s"mortonCodeN needs at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and n*bits <= 63, got n=$n bits=$bits")
    val ls = cols.map(_.cast("long"))
    (0 until bits).flatMap { i =>
      ls.zipWithIndex.map { case (c, ci) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), n * i + ci)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** [[compact]]'s multi-dimensional sibling: rewrite `in` as `numFiles`
    * files RANGE-partitioned and internally sorted by the Morton code of
    * (`colA` % 2^bits, `colB` % 2^bits). Content preserved row-for-row;
    * the interleave column is computed for layout only and not written. */
  def zorderCompact(spark: SparkSession, in: String, out: String,
                    numFiles: Int, colA: String, colB: String,
                    bits: Int = 8): DataFrame =
    zorderCompactN(spark, in, out, numFiles, Seq(colA, colB), bits)

  /** N-column Z-order layout — same contract as [[zorderCompact]] over
    * any number of clustering columns: each column's low `bits` bits
    * interleave into one code, files range-partition and sort by it, and
    * min/max row-group stats prune range predicates on EVERY clustering
    * column independently (the LayoutSpec pins per-column file-level
    * selectivity for the 3-column case). */
  def zorderCompactN(spark: SparkSession, in: String, out: String,
                     numFiles: Int, cols: Seq[String],
                     bits: Int = 8): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val mask = (1 << bits) - 1
    val df = spark.read.parquet(in)
    df.withColumn("__z", mortonCodeN(
        cols.map(c => col(c).bitwiseAND(lit(mask))), bits))
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
