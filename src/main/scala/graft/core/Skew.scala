package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting utilities for skewed aggregation keys (SURVEY §2's scale
  * notes: "skewed keys → salting or AQE skew-join"). AQE's skew handling
  * covers JOINS; a skewed `groupBy(key).agg(collect_set/countDistinct)`
  * still funnels one hot key's whole value set through one reducer.
  * These helpers split each key's values across `saltBuckets` partial
  * groups by HASH OF THE VALUE — deterministic (no RNG state), and equal
  * values land in the same bucket, so the partials of one key are
  * DISJOINT and recombine without a cross-bucket distinct.
  *
  * When to reach for these: keys whose VALUE CARDINALITY is unbounded by
  * the domain — per-shingle posting lists on a web corpus, per-user event
  * sets, per-token document lists. When the per-key set is domain-bounded
  * (e.g. genes per pathway), plain collect_set is one shuffle cheaper and
  * the right default.
  */
object Skew {

  private def salt(value: Column, buckets: Int): Column =
    pmod(xxhash64(value), lit(buckets))

  /** Two-phase `collect_set`: per-(key, salt) partial sets, then one
    * flatten per key. The second shuffle carries at most `saltBuckets`
    * rows per key, each bounded by that bucket's value share — a hot key
    * no longer serializes through a single task. Output array is sorted
    * (same canonical form as `sort_array(collect_set(...))`). */
  def saltedCollectSet(df: DataFrame, keys: Seq[String], valueCol: String,
                       outCol: String, saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(col(valueCol), saltBuckets))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(keyCols: _*)
      // partials are disjoint by construction (bucket = hash(value)), so
      // flatten IS the set — no cross-bucket distinct needed
      .agg(array_sort(flatten(collect_list(col("__partial")))).as(outCol))
  }

  /** Two-phase `countDistinct`: per-(key, salt) distinct counts, then a
    * sum per key. Bucket-disjointness makes the sum exact. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                          outCol: String, saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", salt(col(valueCol), saltBuckets))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(countDistinct(col(valueCol)).as("__partial_n"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial_n")).as(outCol))
  }
}
