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

  /** Atomically-as-possible replace `dir` with the fully-written `tmp`
    * directory: rename `dir` aside, rename `tmp` into place, delete the
    * old copy LAST — and every rename's boolean result is CHECKED
    * (Hadoop `FileSystem.rename` signals quota/permission/existing-dst
    * failures by returning false, not throwing; an unchecked swap that
    * proceeds to the delete would destroy the only copy). A failed
    * second rename rolls the original back before erroring, so no
    * failure path loses data. The swap windows: before the first
    * rename, `dir` is untouched; between the renames, `dir` is
    * momentarily absent with the full old copy at `dir__swap_old` —
    * run maintenance from ONE process with no concurrent reader/writer
    * of `dir` (the single-writer constraint every OPTIMIZE without a
    * transaction log carries). */
  private[graft] def swapInto(spark: SparkSession, dir: String,
                              tmp: String): Unit = {
    val fs = graft.core.Fs.fs(spark, dir)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val old = s"${dir}__swap_old"
    fs.delete(p(old), true)
    require(fs.rename(p(dir), p(old)),
      s"swapInto: rename $dir -> $old failed; $dir left untouched")
    if (!fs.rename(p(tmp), p(dir))) {
      val restored = fs.rename(p(old), p(dir))
      sys.error(s"swapInto: rename $tmp -> $dir failed" +
        (if (restored) s"; original restored from $old"
         else s"; RESTORE ALSO FAILED — original preserved at $old"))
    }
    fs.delete(p(old), true)
    ()
  }

  /** IN-PLACE [[compact]]: rewrite `dir` itself to `numFiles` sorted
    * files through a sibling tmp directory and the checked
    * [[swapInto]] rename swap (parquet cannot overwrite its own
    * input). */
  def compactInPlace(spark: SparkSession, dir: String, numFiles: Int,
                     sortCols: Seq[String]): Unit = {
    val tmp = s"${dir}__compact_tmp"
    graft.core.Fs.delete(spark, tmp)
    compact(spark, dir, tmp, numFiles, sortCols)
    swapInto(spark, dir, tmp)
  }

  /** Fold EVERY `batch_id=<k>` partition of a streaming-append corpus
    * into ONE archive partition `batch_id=-1` (a batch id streaming
    * never issues) of `numFiles` files, in-file sorted by `sortCol` —
    * the root stays a pure partitioned layout, so post-compaction
    * batches keep appending their own `batch_id=<k>` directories beside
    * it. Staged through a sibling tmp + the checked [[swapInto]]; the
    * single-writer constraint applies. Shared by the ingest compactors
    * ([[graft.streaming.CuratePipeline.compactIngest]],
    * [[graft.streaming.NearDupStream.compactIngest]]). */
  private[graft] def foldCorpusPartitions(spark: SparkSession,
                                          corpusPath: String,
                                          numFiles: Int,
                                          sortCol: String): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val tmp = s"${corpusPath}__fold_tmp"
    graft.core.Fs.delete(spark, tmp)
    spark.read.parquet(corpusPath).drop("batch_id")
      .repartition(numFiles)
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/batch_id=-1")
    swapInto(spark, corpusPath, tmp)
  }

  /** IN-PLACE compaction of a `bp`-partitioned layout (the persisted
    * MinHash band index, [[graft.ops.Dedup.bandLayoutPath]]): rows
    * re-cluster one-task-per-`bp` and land as ONE file per partition
    * directory, in-file sorted by `sortCols` — partition pruning
    * semantics are untouched (same `bp` values, same directory shape),
    * only the file count folds from O(appends × partitions) to
    * O(partitions). Staged through tmp + [[swapInto]]; single-writer. */
  private[graft] def compactPartitionedInPlace(spark: SparkSession,
                                               dir: String,
                                               sortCols: Seq[String]): Unit = {
    val tmp = s"${dir}__compact_tmp"
    graft.core.Fs.delete(spark, tmp)
    val df = spark.read.parquet(dir)
    df.repartition(col("bp"))
      .sortWithinPartitions(("bp" +: sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("bp").parquet(tmp)
    swapInto(spark, dir, tmp)
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

  /** Hilbert-curve index of `n` coordinates, each truncated to `bits`
    * low bits — [[mortonCodeN]]'s better-locality sibling (the curve
    * behind Databricks liquid clustering / Amazon Ion layouts): every
    * consecutive pair of Hilbert indices differs by ±1 in EXACTLY one
    * coordinate, so a range of codes is a connected cell path and
    * min/max file stats prune even tighter than the Z-order's jumps.
    * Skilling's public-domain axes→transpose algorithm (J. Skilling,
    * "Programming the Hilbert curve", AIP Conf. Proc. 707, 2004),
    * driver arithmetic per row via a deterministic UDF — layout
    * rewrites run it once per row, off the query hot path. `n·bits`
    * must stay ≤ 63, like the Morton form. */
  private[graft] def hilbertScalar(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = coords.clone()
    // Skilling: inverse undo of excess work (axes -> transpose)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transposed form: bit j of x(i) lands at
    // position j*n + (n-1-i) — column 0 carries the most significant
    // bit of each group
    var code = 0L
    var j = 0
    while (j < bits) {
      i = 0
      while (i < n) {
        code |= ((x(i) >> j) & 1L) << (j * n + (n - 1 - i))
        i += 1
      }
      j += 1
    }
    code
  }

  /** Inverse of [[hilbertScalar]] — used by the bijectivity/adjacency
    * specs and any reader that wants the cell back from a code. */
  private[graft] def hilbertDecode(code: Long, n: Int,
                                   bits: Int): Array[Long] = {
    val x = new Array[Long](n)
    var j = 0
    while (j < bits) {
      var i = 0
      while (i < n) {
        x(i) |= ((code >> (j * n + (n - 1 - i))) & 1L) << j
        i += 1
      }
      j += 1
    }
    // Gray decode
    var t = x(n - 1) >> 1
    var i = n - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // redo excess work (transpose -> axes)
    var q = 2L
    while (q != (1L << bits)) {
      val p = q - 1
      i = n - 1
      while (i >= 0) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t2 = (x(0) ^ x(i)) & p; x(0) ^= t2; x(i) ^= t2 }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  /** Column form of [[hilbertScalar]] over `cols` — each masked to
    * `bits` low bits INSIDE the kernel (the [[zorderCompactN]]
    * truncation contract), null if any coordinate is null (the
    * [[mortonCodeN]] null semantics — the curves agree). Native
    * codegen'd expression ([[graft.functions.HilbertCodeExpr]]), not a
    * UDF: no boxed `Seq[Long]` conversion per row and no `ScalaUDF`
    * codegen fence in the layout rewrite. */
  def hilbertCodeN(cols: Seq[Column], bits: Int = 8): Column = {
    val n = cols.length
    require(n >= 2, s"hilbertCodeN needs at least 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and n*bits <= 63, got n=$n bits=$bits")
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(graft.functions.HilbertCodeExpr(
      ColumnShim.expression(array(cols.map(_.cast("long")): _*)), bits))
  }

  /** [[zorderCompactN]] with the Hilbert interleave — same contract
    * (content preserved, range-partitioned + in-file sorted by the
    * code), tighter per-column locality. */
  def hilbertCompactN(spark: SparkSession, in: String, out: String,
                      numFiles: Int, cols: Seq[String],
                      bits: Int = 8): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val df = spark.read.parquet(in)
    df.withColumn("__h", hilbertCodeN(cols.map(col), bits))
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
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
