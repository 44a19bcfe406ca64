package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the snapshot compaction a lakehouse table
  * maintained from a CDC feed needs: fold a changelog of
  * insert/update/delete rows into a base snapshot, last writer (highest
  * sequence) wins per key, a winning delete removes the key. This
  * completes the incremental-populate family: [[graft.streaming
  * .IncrementalPopulate]] is the insert-if-absent merge (first writer
  * wins, append-only); CDC apply is the general upsert-with-tombstones
  * semantics of Delta/Hudi/Iceberg MERGE pipelines.
  *
  * Scale shape: ONE shuffle — base and changelog are tagged and
  * unioned, and the winner per key is an orderable-struct `max`
  * aggregation (the [[Dedup]] survivor discipline: never a row_number
  * window, so map-side partial aggregation halves what the exchange
  * carries, and a hot key funnels only its own rows). No
  * read-modify-write of the base beyond the one scan; at 100 TB the
  * base side would be the bucketed table so the aggregation's exchange
  * carries only the changelog.
  *
  * Sequence threading: when `base` carries `seqCol`, its rows apply at
  * their STORED sequences and the output retains each key's winning
  * sequence — thread that through fold chains (as
  * [[graft.streaming.CdcStream]] does) and out-of-order batch delivery
  * still converges to last-writer-wins: a later batch carrying an older
  * change loses to the snapshot row's recorded newer sequence. A
  * seq-less base applies at sequence 0 and yields a seq-less snapshot —
  * the one-shot shape. Change sequences must be POSITIVE and unique per
  * key across the feed (the usual CDC contract); non-positive or null
  * change sequences fail the job loudly rather than silently losing to
  * base rows. Duplicate (key, seq) rows resolve by the struct order
  * (op, then payload) — deterministic under any partitioning.
  */
object Cdc {

  /** Fold `changes` into `base`. `base` carries `keys` + payload (+
    * optionally `seqCol` and `opCol`, see sequence threading above);
    * `changes` carries `keys` + the SAME payload columns + `opCol`
    * (`I`/`U`/`D`, case-insensitive) + `seqCol` (castable to long, > 0).
    * Returns the new snapshot with `base`'s payload schema, plus the
    * winning sequence iff the base carried one.
    *
    * `retainTombstones = true` KEEPS winning delete rows (with the
    * winning op in `opCol`) instead of dropping them — required for
    * fold CHAINS whose batches can deliver out of order: a dropped
    * delete forgets its sequence, so an older change arriving in a
    * later batch would silently resurrect the key. Chains retain
    * tombstones per fold and filter `op != 'D'` only at read time
    * ([[graft.streaming.CdcStream.currentView]]); the default drops
    * them — the one-shot shape, where the union carries every change
    * and no later batch exists. */
  def applySnapshot(base: DataFrame, changes: DataFrame, keys: Seq[String],
                    opCol: String = "op",
                    seqCol: String = "seq",
                    retainTombstones: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "CDC apply needs at least one key column")
    val hasSeq = base.columns.contains(seqCol)
    val hasOp = base.columns.contains(opCol)
    val payload = base.columns
      .filterNot((keys :+ seqCol :+ opCol).contains).toSeq
    val missing = (keys ++ payload :+ opCol :+ seqCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes frame is missing columns: ${missing.mkString(", ")}")
    val baseSeq = if (hasSeq) col(seqCol).cast("long") else lit(0L)
    val baseOp = if (hasOp) upper(col(opCol)) else lit("I")
    // loud failure on a non-positive/null change sequence — it would
    // otherwise silently tie/lose against base rows at sequence 0
    val changeSeq = when(col(seqCol).cast("long") > 0,
      col(seqCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("CDC change sequence must be positive, got "),
        coalesce(col(seqCol).cast("string"), lit("null")))))
    val b = base.select(keys.map(col) :+
      struct(baseSeq.as("__seq") +: baseOp.as("__op") +:
        payload.map(col): _*).as("__w"): _*)
    val c = changes.select(keys.map(col) :+
      struct(changeSeq.as("__seq") +: upper(col(opCol)).as("__op") +:
        payload.map(col): _*).as("__w"): _*)
    val seqOut = if (hasSeq) Seq(col("__w.__seq").as(seqCol)) else Nil
    val opOut =
      if (retainTombstones) Seq(col("__w.__op").as(opCol)) else Nil
    val won = b.unionByName(c)
      .groupBy(keys.map(col): _*)
      .agg(max(col("__w")).as("__w"))
    (if (retainTombstones) won else won.filter(col("__w.__op") =!= "D"))
      .select(keys.map(col) ++
        payload.map(p => col(s"__w.$p").as(p)) ++ seqOut ++ opOut: _*)
  }

  /** Snapshot DIFF — [[applySnapshot]]'s inverse: given two corpus
    * versions, derive the change feed `(keys…, change)` with change ∈
    * {added, removed, changed} (unchanged keys are absent — the diff of
    * two 100 TB snapshots is delta-sized output). The dataset-versioning
    * primitive: audit what a pipeline release did to the corpus,
    * generate a CDC feed from systems that only hand over full dumps,
    * or drive incremental re-embedding of exactly the changed docs.
    *
    * Scale shape: each side reduces to `(keys, xxhash64(compareCols))`
    * BEFORE the join, so the one full-outer shuffle ships 8-byte
    * digests instead of document payloads — content equality via hash
    * equality, the engine's standard negligible-collision posture (a
    * colliding changed row would report unchanged; at 2⁻⁶⁴ per pair
    * this is the fingerprint-dedup trade, documented there). Duplicate
    * keys within a snapshot are rejected loudly — a diff over an
    * ambiguous key is not a diff — and so are NULL key values: a null
    * never equi-joins, so the same unchanged null-keyed row would
    * otherwise report as both 'added' and 'removed' on every diff,
    * churning downstream consumers forever. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty,
      "snapshotDiff needs at least one compare column")
    def digest(df: DataFrame, hName: String): DataFrame = df
      .select(keys.map(k =>
        when(col(k).isNotNull, col(k)).otherwise(raise_error(lit(
          s"snapshotDiff: null value in key column '$k' — keys must " +
            "be non-null (a null never equi-joins and would misreport " +
            "as added+removed)"))).as(k)) ++ compareCols.map(col): _*)
      .groupBy(keys.map(col): _*)
      .agg(max(xxhash64(struct(compareCols.map(col): _*))).as(hName),
        count(lit(1)).as("__n"))
      .select(keys.map(col) :+
        when(col("__n") === 1, col(hName)).otherwise(raise_error(concat(
          lit("snapshotDiff: duplicate key in snapshot: "),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*))))
          .as(hName): _*)
    digest(oldSnap, "__h_old")
      .join(digest(newSnap, "__h_new"), keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") =!= col("__h_new"), "changed")
          .otherwise("unchanged").as("change"): _*)
      .filter(col("change") =!= "unchanged")
  }
}
