package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence (funnel) analysis: of the users who performed
  * stage 1, how many went on to stage 2 strictly later, then stage 3
  * strictly after that — the conversion statistic every event-analytics
  * surface serves (the reference's event log — `models.py:40-134` Action
  * rows `(resource, action, created)` — is exactly this shape, queried
  * there only as "latest action"; the funnel is the aggregate form of the
  * same ordered-sequence question).
  *
  * Semantics: per user, `stage_ts(1)` = earliest ts of stage-1 events;
  * `stage_ts(i+1)` = earliest ts of stage-(i+1) events STRICTLY after
  * `stage_ts(i)`. A user "reaches" stage i when `stage_ts(i)` exists.
  * Strict inequality makes the chain deterministic without a tie-break
  * ordering among same-timestamp events — two stages sharing one µs never
  * chain, in either engine. This greedy earliest-chain is the standard
  * funnel definition and is optimal: taking the earliest admissible ts at
  * every stage dominates any other valid chain, so "reached stage i"
  * agrees with the existential definition.
  *
  * Scale shape: ONE shuffle. Events are pre-filtered to the stage types
  * (pushed to the scan), collected per user as (ts, stage) pairs, sorted
  * in-place, and folded left by a codegen'd `aggregate` state machine —
  * the state is the per-stage timestamp array, O(stages) per user. The
  * per-user collected list is bounded by that user's stage-event count —
  * the same per-key contract as sessionization (a key's own events fit
  * its partition). The alternative formulation (stage-count self-joins)
  * shuffles the event table once PER STAGE; this is one pass regardless
  * of funnel depth.
  */
object Funnel {

  /** The per-user face: `(key, reach_ts: Array[ts], depth)` — the
    * per-stage first-reach timestamps (null = stage not reached) and the
    * deepest stage index reached; what a training pipeline joins back to
    * label conversion windows.
    *
    * `maxEventsPerKey` hardens the documented per-key contract: the
    * collected list is bounded by a key's own STAGE-event count, which a
    * bot/runaway key can grow to executor-OOM scale at 100 TB. With a
    * cap set, keys over it are pruned BEFORE the collect (one count
    * aggregation + one anti-join — [[graft.core.Skew.underCapOnly]]),
    * so the aggregation buffer is ≤ cap by construction; route the
    * pruned keys to a side-output via [[rejectedKeys]] (stable reason
    * column) instead of silently losing them. The default
    * (`Long.MaxValue`) leaves the plan untouched. */
  def perUserReach(events: DataFrame, stages: Seq[String],
                   keyCol: String = "user_id", tsCol: String = "ts",
                   typeCol: String = "event_type",
                   maxEventsPerKey: Long = Long.MaxValue): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, "funnel stages must be distinct")
    val stageIdx: Column = stages.zipWithIndex.foldRight(lit(-1): Column) {
      case ((s, i), acc) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    // the reach-state array carries the ts column's own type, so the
    // operator works over timestamps and numeric (µs-epoch) ts alike
    val tsType = events.schema(tsCol).dataType
    graft.core.Skew.underCapOnly(
      events.filter(col(typeCol).isin(stages: _*) && col(tsCol).isNotNull),
      Seq(keyCol), maxEventsPerKey)
      .select(col(keyCol), struct(col(tsCol).as("ts"),
        stageIdx.as("stage")).as("ev"))
      .groupBy(keyCol)
      .agg(array_sort(collect_list("ev")).as("evs"))
      // fold the time-ordered events through the stage chain: state =
      // array of per-stage first-reach timestamps (null = not reached);
      // an event advances the chain iff it is the NEXT unreached stage
      // and strictly later than the previous stage's reach time
      .withColumn("reach_ts", aggregate(
        col("evs"),
        array(stages.map(_ => lit(null).cast(tsType)): _*),
        (state, ev) => {
          val nextStage = size(filter(state, x => x.isNotNull))
          // 1-indexed lookup of the previous stage's ts; the greatest()
          // guard keeps the index legal when no stage is reached yet
          // (that branch is decided by the === 0 check, not the lookup)
          val prevTs = element_at(state, greatest(nextStage, lit(1)))
          val advances = ev.getField("stage") === nextStage &&
            (nextStage === 0 || ev.getField("ts") > prevTs)
          when(advances,
            concat(slice(state, lit(1), nextStage),
              array(ev.getField("ts")),
              slice(state, nextStage + 2, size(state))))
            .otherwise(state)
        }))
      .withColumn("depth", size(filter(col("reach_ts"), x => x.isNotNull)))
      .drop("evs")
  }

  /** The reject side-output of [[perUserReach]]'s cap: keys whose
    * STAGE-event volume exceeds `maxEventsPerKey`, with their counts and
    * the stable reason `events_per_key_cap` — counted over the same
    * filtered feed the accept side prunes, so accept ∪ reject covers
    * every key exactly once. Output: (keyCol, n_events, reason). */
  def rejectedKeys(events: DataFrame, stages: Seq[String],
                   maxEventsPerKey: Long, keyCol: String = "user_id",
                   tsCol: String = "ts",
                   typeCol: String = "event_type"): DataFrame =
    graft.core.Skew.overCapKeys(
      events.filter(col(typeCol).isin(stages: _*) && col(tsCol).isNotNull),
      Seq(keyCol), maxEventsPerKey)

  /** Conversion-lag statistics per funnel transition: for every user who
    * reached stage i+1, the time from their stage-i reach to their
    * stage-(i+1) reach. Exact integer measures only (count, µs sum,
    * µs min/max) — trailing means are a single division away for the
    * consumer, and everything emitted is engine-bit-exact. Lags come from
    * `timestamp_diff(MICROSECOND, …)` — a raw µs subtraction for both
    * TimestampType and TimestampNTZType, so NTZ inputs never round-trip
    * through a session-timezone cast (a DST-spanning lag is exact).
    * Output: (transition, n, sum_lag_us, min_lag_us, max_lag_us), one
    * row per adjacent stage pair — zero-converter transitions emit
    * n = 0 with NULL lag statistics (SQL aggregate-over-empty parity). */
  def transitionLags(events: DataFrame, stages: Seq[String],
                     keyCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(stages.size >= 2, "transition lags need at least two stages")
    require(Seq(org.apache.spark.sql.types.TimestampType,
      org.apache.spark.sql.types.TimestampNTZType)
      .contains(events.schema(tsCol).dataType),
      s"transitionLags needs a timestamp ts column (µs lags); " +
        s"'$tsCol' is ${events.schema(tsCol).dataType.sql}")
    val per = perUserReach(events, stages, keyCol, tsCol, typeCol)
    // one pass over the per-user frame: every transition's lag computed
    // in-row (null when the later stage was not reached), exploded, and
    // folded by one hash-aggregation — never a scan per stage pair
    val transitions = array(
      stages.sliding(2).toSeq.zipWithIndex.map { case (pair, i) =>
        struct(lit(s"${pair.head}->${pair.last}").as("transition"),
          when(col("depth") >= i + 2,
            timestamp_diff("MICROSECOND",
              element_at(col("reach_ts"), i + 1),
              element_at(col("reach_ts"), i + 2))).as("lag_us"))
      }: _*)
    // the derived array is staged in its own projection before the
    // explode — a complex inline generator child defeats codegen staging
    val lags = per.select(transitions.as("__trans"))
      .select(explode(col("__trans")).as("t"))
      .filter(col("t.lag_us").isNotNull)
      .groupBy(col("t.transition").as("transition"))
      .agg(count(lit(1)).as("n"), sum("t.lag_us").as("sum_lag_us"),
        min("t.lag_us").as("min_lag_us"), max("t.lag_us").as("max_lag_us"))
    // transition dimension drives the output so zero-converter
    // transitions still emit their row (n = 0, NULL stats)
    val dim = stages.sliding(2).toSeq
      .map(p => s"${p.head}->${p.last}").toDF("transition")
    dim.join(lags, Seq("transition"), "left")
      .select(col("transition"), coalesce(col("n"), lit(0L)).as("n"),
        col("sum_lag_us"), col("min_lag_us"), col("max_lag_us"))
  }

  /** Per-stage reach counts: one row per stage —
    * `(stage, stage_name, users)`, `users` monotonically non-increasing
    * down the funnel. The depth histogram is stage-count-sized, so the
    * final ≥-join against the stage dimension is a trivial
    * dimension×dimension combine, not a data-sized inequality join. */
  def reach(events: DataFrame, stages: Seq[String],
            keyCol: String = "user_id", tsCol: String = "ts",
            typeCol: String = "event_type"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val perUser = perUserReach(events, stages, keyCol, tsCol, typeCol)
    val stageDim = stages.zipWithIndex.map { case (s, i) => (i + 1, s) }
      .toDF("stage", "stage_name")
    // the stage dimension drives a LEFT join so a stage nobody reached
    // still emits its row with users = 0 (the oracle's count(*) parity)
    stageDim
      .join(perUser.groupBy("depth").agg(count(lit(1)).as("n")),
        col("depth") >= col("stage"), "left")
      .groupBy("stage", "stage_name")
      .agg(coalesce(sum("n"), lit(0L)).as("users"))
  }

  /** First-order Markov transition counts over each key's event-time-
    * ordered sequence — the behavior-modeling aggregate (user-journey
    * transition matrices, next-event prediction labels, synthetic-
    * trajectory priors). For every adjacent pair in a key's sequence
    * (ordered by `(tsCol, tieCol)` — the tie column makes same-µs
    * ordering deterministic, the j19 trajectory discipline) one
    * `(from_type, to_type)` observation counts.
    *
    * Scale shape: ONE data-sized shuffle — the per-key lead window —
    * then a map-side-combined aggregation onto the |types|² key domain;
    * the `from_total` denominator rides a second window over that
    * dimension-sized frame, never over the corpus. Exact BIGINT counts
    * (probability = n / from_total is the consumer's one division).
    * Output: (from_type, to_type, n, from_total). */
  def transitionCounts(events: DataFrame, keyCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts",
                       tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val counts = events
      .select(col(keyCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    counts.withColumn("from_total",
      sum("n").over(Window.partitionBy("from_type")))
  }
}
