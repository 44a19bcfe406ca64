package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKRows

/** Group-wise ranking without window funnels. */
object Rank {

  /** The k first rows of every group under the lexicographic order of
    * `orderCols` (all ascending, or all descending with
    * `ascending = false`) — the "top 3 orders per customer" shape. All
    * other columns ride along as payload; payload columns also serve as
    * the final tie-breakers (they sit after `orderCols` in the ordering
    * struct), so the result is partitioning-independent whenever the
    * selected columns form a total order (e.g. any unique key present).
    *
    * Scale shape: ONE ObjectHashAggregate on the group keys with
    * map-side partial [[graft.functions.TopKRowsAgg]] buffers — every
    * task prunes its slice to ≤ k rows per group before the exchange,
    * so the shuffle carries `groups × k` rows. The
    * `row_number().over(Window)` formulation this replaces ships and
    * sorts EVERY row of a group in the single task that owns it — the
    * hot-group killer at 100 TB.
    *
    * Mixed per-column directions aren't expressible here (the struct
    * order is all-asc or all-desc); encode a mixed sort by negating the
    * offending numeric column upstream. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[String], k: Int,
                   ascending: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(orderCols.nonEmpty, "topKPerGroup needs at least one order column")
    val payload = df.columns.toSeq
      .filterNot(c => groupCols.contains(c) || orderCols.contains(c))
    val fields = orderCols ++ payload
    df.groupBy(groupCols.map(col): _*)
      .agg(TopKRows.topKStructs(struct(fields.map(col): _*), k, ascending)
        .as("__top"))
      .select(groupCols.map(col) :+ explode(col("__top")).as("__r"): _*)
      .select(groupCols.map(col) ++
        fields.map(c => col(s"__r.`$c`").as(c)): _*)
  }

  /** EXACT group-wise quantiles — the precise face of the sketch
    * profiler ([[Profile]]'s approx percentiles): per group, the
    * continuous (linearly interpolated) quantile of `valueCol` at each
    * requested fraction, long form `(keys…, p, q)`. Built on Spark's
    * exact `percentile` aggregate: ONE hash aggregation whose partial
    * state is a per-group value→count map — map-side combinable, no
    * window, no global sort. That state is bounded by the group's
    * DISTINCT value count, which is the honest scale contract: exact
    * quantiles are for QUANTIZED domains (scores in [0,100], cents,
    * token counts); for unbounded continuous domains use the KLL
    * sketch profile, which is what it exists for. Interpolation is the
    * standard `(1−f)·x_lo + f·x_hi` at rank `p·(n−1)` — the same
    * definition as ANSI `percentile_cont`, so the result is
    * value-comparable across engines. */
  def groupQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(keys.nonEmpty, "groupQuantiles needs at least one key column")
    require(ps.nonEmpty, "groupQuantiles needs at least one fraction")
    require(ps.forall(p => p >= 0.0 && p <= 1.0),
      s"fractions must be in [0, 1], got ${ps.mkString(", ")}")
    df.groupBy(keys.map(col): _*)
      .agg(percentile(col(valueCol),
        array(ps.map(lit): _*)).as("__qs"))
      .withColumn("__ps", array(ps.map(lit): _*))
      .select(keys.map(col) :+
        explode(arrays_zip(col("__ps"), col("__qs"))).as("__z"): _*)
      .select(keys.map(col) :+ col("__z.__ps").as("p") :+
        col("__z.__qs").as("q"): _*)
  }

  /** Exact per-group MODE — the most frequent value, ties to the
    * smallest (profiling's "typical value" beside [[groupQuantiles]]).
    * Two map-side-combined hash aggregations: (group, value) counts,
    * then ONE orderable-struct MIN per group — `(−cnt, value)` makes
    * "highest count, then smallest value" a plain minimum, so no
    * window, no sort, no per-group funnel (the CDC struct-max
    * discipline). Count negation bounds: exact for any BIGINT count.
    * Output: (keys…, mode, n). */
  def modeBy(df: DataFrame, keys: Seq[String],
             valueCol: String): DataFrame = {
    require(keys.nonEmpty, "modeBy needs at least one key column")
    // NULL values are ignored (the ANSI mode() contract — Spark struct
    // ordering sorts nulls FIRST, so an unfiltered null would win count
    // ties that the SQL oracle's NULLS LAST loses); an all-null group
    // emits no row
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    counts
      .groupBy(keys.map(col): _*)
      .agg(min(struct((-col("__n")).as("nn"), col(valueCol).as("v")))
        .as("__m"))
      .select(keys.map(col) :+ col("__m.v").as("mode") :+
        (-col("__m.nn")).as("n"): _*)
  }

  /** Percent-rank normalization per group — map a feature onto [0, 1]
    * by its within-group rank (`(rank − 1)/(n − 1)`, ties share), the
    * distribution-free scaling step quality-score mixing uses when raw
    * scales aren't comparable across sources. Exact: the rank is an
    * integer and the one division is IEEE — engine-bit-identical, the
    * same contract as [[winsorize]]'s bounds. ONE per-group window
    * shuffle (rank needs a total order over the group — this is the
    * honest cost; for group-free scaling use [[graft.ops.TrainingPrep
    * .quantileBand]]'s sketch path). A singleton group emits 0.0.
    * Output: input columns + `pr`. */
  def percentRankBy(df: DataFrame, keys: Seq[String],
                    valueCol: String): DataFrame = {
    require(keys.nonEmpty, "percentRankBy needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    df.withColumn("pr", percent_rank().over(w))
  }

  /** Winsorize (clip) a value column at per-group exact quantile bounds
    * — the feature-clipping step a training pipeline runs before
    * normalization so tail outliers don't set the scale. Each row gets
    * its group's `[lo, hi]` continuous quantiles as bounds and
    * `clipped = min(max(v, q_lo), q_hi)`; the bounds ride along for
    * auditability. Same exact-`percentile` substrate (and the same
    * quantized-domain scale contract) as [[groupQuantiles]].
    *
    * Scale shape: ONE map-side-combined aggregation to the group-sized
    * bounds frame, then a BROADCAST join back — the corpus never
    * shuffles. Output: input columns + `q_lo`, `q_hi`, `clipped`. */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                lo: Double, hi: Double): DataFrame = {
    require(keys.nonEmpty, "winsorize needs at least one key column")
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi,
      s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(percentile(col(valueCol), lit(lo)).as("q_lo"),
        percentile(col(valueCol), lit(hi)).as("q_hi"))
    df.join(broadcast(bounds), keys)
      .withColumn("clipped",
        least(greatest(col(valueCol).cast("double"), col("q_lo")),
          col("q_hi")))
  }
}
