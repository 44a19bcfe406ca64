package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based corpus profiling — the dataset-statistics pass a pipeline
  * runs BEFORE committing to a curation recipe (per-domain cardinalities,
  * value distributions, volume): at 100 TB these must come from one-pass
  * mergeable sketches, not exact operators.
  *
  * Why sketches are the scale choice here and nowhere else in the repo:
  * `countDistinct` inside a grouped aggregation plans an EXPAND + a
  * second shuffle keyed on (group, value) — at corpus scale that is a
  * full re-shuffle of the fact table per distinct column. The HLL++
  * (`approx_count_distinct`) and KLL-quantile (`approx_percentile`)
  * aggregates instead carry O(1)-size mergeable state through the normal
  * partial-aggregation path: one map-side pass, one narrow merge, bounded
  * error the profile's consumers tolerate by design. The registered gate
  * (`a15_sketch_profile`) pins that error contract against the exact
  * answers at test scale.
  */
object Profile {

  /** Per-key profile: row volume, approximate distinct count of `idCol`
    * (HLL++, default rsd 5%), approximate p50/p95 of `valueCol`
    * (quantile sketch, accuracy 1e4). One pass, map-side combinable.
    * Output: (keyCol, n, n_distinct_approx, p50_approx, p95_approx). */
  def sketchProfile(df: DataFrame, keyCol: String, idCol: String,
                    valueCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(idCol).as("n_distinct_approx"),
        percentile_approx(col(valueCol),
          array(lit(0.5), lit(0.95)), lit(10000)).as("pcts"))
      .select(col(keyCol), col("n"), col("n_distinct_approx"),
        element_at(col("pcts"), 1).as("p50_approx"),
        element_at(col("pcts"), 2).as("p95_approx"))

  /** Persistable per-key HLL sketch STATES (Apache DataSketches binary
    * blobs) — the pre-aggregation side of the mergeable-profile story:
    * each snapshot/partition/day writes its own state table once, and
    * corpus-wide cardinalities then come from merging driver-free,
    * without ever rescanning the raw snapshots. This is the standard
    * telemetry-rollup posture at 100 TB (sketch once per ingest, union
    * forever); [[sketchProfile]] is the one-shot flavor.
    *
    * Output: (keyCol, hll_state: Binary, n: Long) — parquet-safe. */
  def hllStates(df: DataFrame, keyCol: String, idCol: String,
                lgK: Int = 12): DataFrame =
    df.groupBy(keyCol)
      .agg(hll_sketch_agg(col(idCol), lit(lgK)).as("hll_state"),
        count(lit(1)).as("n"))

  /** Merge persisted sketch states (any number of snapshots unioned into
    * `states`) back to per-key estimates. Union is associative and
    * commutative, so snapshot arrival order never matters; counts sum
    * exactly alongside. Output: (keyCol, n_distinct_approx, n). */
  def mergeHllStates(states: DataFrame, keyCol: String): DataFrame =
    states.groupBy(keyCol)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll_state")))
        .as("n_distinct_approx"),
        sum("n").as("n"))

  /** Persistable per-key KLL quantile sketch STATES (Apache DataSketches
    * binary blobs, Spark's native `kll_sketch_agg_double`) — the
    * quantile twin of [[hllStates]]: each snapshot/partition/micro-batch
    * writes its own state table once, and corpus-wide percentiles then
    * come from merging, without rescanning raw data. KLL is a MERGEABLE
    * summary (Agarwal et al., "Mergeable summaries", PODS 2012; Karnin,
    * Lang & Liberty, FOCS 2016): the merged sketch carries the same
    * normalized rank-error bound as a one-shot sketch of the union —
    * unlike HLL it is not bit-identical to the one-shot state (merge
    * order shifts compaction), which is why its gates check the RANK
    * CONTRACT, not state equality. `k` = 2048 bounds normalized rank
    * error well under 1%. Output: (keyCol, kll_state: Binary, n). */
  def kllStates(df: DataFrame, keyCol: String, valueCol: String,
                k: Int = 2048): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(keyCol)
      .agg(expr(s"kll_sketch_agg_double($valueCol, $k)").as("kll_state"),
        count(lit(1)).as("n"))

  /** Merge persisted KLL states back to per-key quantile estimates:
    * one `kll_merge_agg_double` fold per key (associative/commutative —
    * snapshot arrival order never matters), then one
    * `kll_sketch_get_quantile_double` per requested rank. Counts sum
    * exactly alongside. Output: (keyCol, p_<rank>…, n). */
  def mergeKllStates(states: DataFrame, keyCol: String,
                     quantiles: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      s"quantile ranks must be in (0, 1], got $quantiles")
    val merged = states.groupBy(keyCol)
      .agg(expr("kll_merge_agg_double(kll_state)").as("__m"),
        sum("n").as("n"))
    val qCols = quantiles.map(q =>
      expr(s"kll_sketch_get_quantile_double(__m, $q)")
        .as(s"p${(q * 100).round}_approx"))
    merged.select(col(keyCol) +: qCols :+ col("n"): _*)
  }

  /** Exact per-key heavy hitters: the k most frequent `valueCol` values
    * per `keyCol`, rank-ordered (count DESC, value ASC) — the "what
    * dominates each slice" profile question (top domains per language,
    * top tokens per source) beside [[sketchProfile]]'s cardinalities.
    *
    * Two-phase exact shape: one hash-groupBy on (key, value) with
    * map-side combine does ALL the summing, then the bounded native
    * aggregate ([[graft.functions.TopKRowsAgg]]) reduces each
    * partition's slice of the reduced frame to ≤ k candidates before the
    * per-key merge — no per-key window funnel, no sketch error. Under
    * Zipf the reduced frame is vocabulary-sized, and only k-row buffers
    * shuffle in phase 2. Ordering (count desc, value asc) is encoded as
    * the ascending struct(−n, value) — the typed-udaf heap this
    * replaced paid a per-row encoder round-trip (the topKPerQuery
    * probe's ~60× finding). Output: (keyCol, rank 1..k, value, n). */
  def topKFrequent(df: DataFrame, keyCol: String, valueCol: String,
                   k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).cast("string").as("__v"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(keyCol)
      .agg(graft.functions.TopKRows.topKStructs(
        struct((-col("__n")).as("nn"), col("__v").as("value")), k)
        .as("hits"))
      .select(col(keyCol), posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col(keyCol), (col("pos") + 1).cast("long").as("rank"),
        col("h.value").as("value"), (-col("h.nn")).as("n"))
  }

  /** Equi-WIDTH histogram per key — the fixed-bin companion of the
    * sketch profile's equi-depth quantiles (feature-distribution audits
    * want both). `bin = floor(v / binWidth)`: one IEEE division + floor,
    * engine-bit-identical, so the counts are exact with no quantization
    * step; `bin_lo = bin · binWidth` rides along for display. ONE
    * map-side-combined aggregation onto the (key × occupied-bin)
    * domain — empty bins are absent by construction (at 100 TB the
    * occupied-bin set is the only bounded one). Output:
    * (keyCol, bin, bin_lo, cnt). */
  def equiWidthHistogram(df: DataFrame, keyCol: String, valueCol: String,
                         binWidth: Double): DataFrame = {
    require(binWidth > 0.0, s"binWidth must be positive, got $binWidth")
    df.groupBy(col(keyCol),
        floor(col(valueCol).cast("double") / binWidth).cast("long")
          .as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyCol), col("bin"),
        (col("bin").cast("double") * binWidth).as("bin_lo"), col("cnt"))
  }

  /** Heavy hitters of `valueCol` per group — the bounded-memory
    * "which values dominate" profile for UNBOUNDED domains (tokens,
    * URLs, user agents) where the exact groupBy-count
    * ([[graft.ops.Rank.modeBy]]'s posture) would carry the whole
    * domain through the shuffle. ONE ObjectHashAggregate whose
    * map-side partial state is a ≤ k-counter Misra–Gries summary
    * ([[graft.functions.MisraGriesAgg]] — a NATIVE
    * TypedImperativeAggregate, mergeable, so partials combine before
    * the exchange; only k-counter maps cross it).
    *
    * Estimates carry the MG contract, not exactness: `est ≤ true ≤
    * est + n/(k+1)` per group, and anything with true count >
    * n/(k+1) is guaranteed present — size k generously above the
    * expected heavy-set size and verify downstream where it matters
    * (the sketch-profile discipline). Output: one row per group:
    * (keys…, hits: array<struct<item, est>> sorted est desc). */
  def heavyHitters(df: DataFrame, keys: Seq[String], valueCol: String,
                   k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.MisraGriesAgg.misraGries(
        col(valueCol).cast("string"), k).as("hits"))
}
