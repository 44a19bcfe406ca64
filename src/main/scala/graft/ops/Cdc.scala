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
  * Determinism: base rows apply at sequence 0; change rows must carry
  * POSITIVE sequences. Duplicate (key, seq) change rows are resolved by
  * the struct order (op, then payload) — deterministic under any
  * partitioning, but callers wanting cross-engine parity keep (key,
  * seq) unique, the usual CDC-feed contract.
  */
object Cdc {

  /** Fold `changes` into `base`. `base` carries `keys` + payload;
    * `changes` carries `keys` + the SAME payload columns + `opCol`
    * (`I`/`U`/`D`, case-insensitive) + `seqCol` (castable to long, > 0).
    * Returns the new snapshot with `base`'s exact schema. */
  def applySnapshot(base: DataFrame, changes: DataFrame, keys: Seq[String],
                    opCol: String = "op",
                    seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "CDC apply needs at least one key column")
    val payload = base.columns.filterNot(keys.contains).toSeq
    val missing = (keys ++ payload :+ opCol :+ seqCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes frame is missing columns: ${missing.mkString(", ")}")
    val b = base.select(keys.map(col) :+
      struct(lit(0L).as("__seq") +: lit("I").as("__op") +:
        payload.map(col): _*).as("__w"): _*)
    val c = changes.select(keys.map(col) :+
      struct(col(seqCol).cast("long").as("__seq") +:
        upper(col(opCol)).as("__op") +: payload.map(col): _*).as("__w"): _*)
    b.unionByName(c)
      .groupBy(keys.map(col): _*)
      .agg(max(col("__w")).as("__w"))
      .filter(col("__w.__op") =!= "D")
      .select(keys.map(col) ++
        payload.map(p => col(s"__w.$p").as(p)): _*)
  }
}
