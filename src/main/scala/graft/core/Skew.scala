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

  /** Salted inner equi-join for SKEWED join keys: every probe-side row
    * gets a deterministic salt from its row identity (`leftIdCol` — NOT
    * the join key: all rows of a hot key must spread across buckets),
    * the build side replicates `saltBuckets`×, and the join runs on
    * (key, salt) — a hot key's probe rows now land on `saltBuckets`
    * reducers instead of one. Result is EXACTLY the plain inner
    * equi-join (every probe row still meets every matching build row,
    * exactly once, in its salt bucket).
    *
    * When to reach for it: both sides too large to broadcast AND the key
    * histogram has heavy hitters (per-domain joins on web corpora,
    * per-token joins under Zipf). The build side pays `saltBuckets`×
    * replication through its shuffle — size `saltBuckets` to the skew
    * factor, not higher. AQE's skew-join split covers many cases at
    * runtime; the explicit salt is for when the skew is KNOWN and the
    * plan must not depend on runtime re-planning (e.g. under a bucketed
    * layout AQE won't touch, or a deterministic-shape requirement). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftIdCol: String, saltBuckets: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      salt(col(leftIdCol), saltBuckets).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
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

  /** The bot-key reject side of a per-key contract: keys whose row
    * volume in `df` exceeds `maxPerKey`, with a STABLE machine-readable
    * reason — what a per-key operator (funnel fold, sessionizer window)
    * routes to a side-output instead of feeding a corpus-scale key into
    * bounded per-key state at 100 TB. One map-side-combined count
    * aggregation (constant per-key state — the same discipline as the
    * dedup df-prune). Output: (keys…, n_events, reason). */
  def overCapKeys(df: DataFrame, keys: Seq[String], maxPerKey: Long,
                  reason: String = "events_per_key_cap"): DataFrame = {
    require(maxPerKey >= 1, s"maxPerKey must be positive, got $maxPerKey")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") > maxPerKey)
      .withColumn("reason", lit(reason))
  }

  /** Prune `df` to rows of keys at or under `maxPerKey` rows — the
    * accept side of [[overCapKeys]]: one count aggregation + one
    * left-anti join on the key; per-key state downstream is then
    * ≤ maxPerKey by construction. `Long.MaxValue` (the callers'
    * default) returns `df` unchanged — zero plan delta when the cap is
    * off. */
  def underCapOnly(df: DataFrame, keys: Seq[String],
                   maxPerKey: Long): DataFrame =
    if (maxPerKey == Long.MaxValue) df
    else df.join(
      overCapKeys(df, keys, maxPerKey).select(keys.map(col): _*),
      keys, "left_anti")
}
