package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of (point-in-time) enrichment — the streaming face of
  * [[graft.ops.Temporal.asOfJoin]]: enrich an event stream with the
  * LATEST state from a second (dimension-change) stream at or before each
  * event's time, per key. This is the production incremental-pipeline
  * posture of feature enrichment ("the user's segment as of the click"):
  * the batch matrix (backward/forward/tolerance/strict/nearest) already
  * exists; this face answers the same backward-inclusive question
  * continuously, emitting each enriched event exactly once.
  *
  * Structured Streaming has no native as-of join (stream-stream joins
  * need a two-sided time-range bound, and "latest ≤ t" is not
  * range-expressible), so this composes the tagged-union trick of the
  * batch operator with `flatMapGroupsWithState` over the merged feed:
  *
  *  - both streams are tagged and unioned, watermarked on event time,
  *    and grouped by key — ONE shuffle, the same plan skeleton as the
  *    batch operator's single window pass;
  *  - per key, state buffers (a) left events not yet STRICTLY below the
  *    watermark and (b) right rows that could still match a
  *    future-or-buffered left event. A left event at time t resolves
  *    exactly when the watermark moves strictly past t. Finality:
  *    `flatMapGroupsWithState` under EventTimeTimeout filters its input
  *    through `WatermarkSupport.watermarkExpression`, which is
  *    `LessThanOrEqual(ts, wm)` — every SURVIVING arrival carries event
  *    time strictly above the watermark (the StreamingSpec boundary
  *    test pins this: a row at exactly the watermark is dropped). So
  *    once wm > t, no admissible right can precede the event and the
  *    backward match is FINAL (the same watermark-finality argument as
  *    the outer interval join's null emission). Strict-below resolution
  *    is one conservative tick later than the input filter strictly
  *    requires — it keeps the operator exact even under the weakest
  *    documented watermark contract (drop only strictly-older rows),
  *    rather than leaning on the filter's inclusive boundary. Rows that
  *    arrive at or below the watermark are best-effort, by Spark's own
  *    contract.
  *  - state is BOUNDED by the watermark horizon: resolved lefts leave
  *    state immediately; right rows at or before the watermark compact
  *    to the single latest one — which must be kept FOREVER (it is the
  *    key's current dimension state, exactly what a feature store keeps
  *    per key), so steady-state is O(1) per key plus the in-horizon
  *    churn. An idle key's state is one compacted right row.
  *
  * Event-time timeouts (not processing time) drive resolution when a
  * micro-batch advances the watermark without delivering rows for a key
  * — deterministic and replayable, the sessionizer's discipline.
  *
  * Timestamps are carried as epoch MICROS through the state (the j10
  * µs-exactness contract); the watermark API yields millis, and the
  * resolution/timeout arithmetic rounds CONSERVATIVELY (a left event
  * resolves only once `wmMs*1000 > tUs`), so sub-millisecond event
  * times never resolve early — they resolve one watermark tick later.
  *
  * Ties: right rows sharing (key, µs) resolve to the max `event_id` —
  * callers wanting engine-exact parity with a pre-aggregated batch
  * oracle should pre-aggregate the right feed per (key, µs), the same
  * discipline as every j10 gate. Left events are emitted in (ts, id)
  * order within a resolution batch; the output set is
  * partitioning-independent.
  */
object AsOfStream {

  /** Merged-feed row: side 1 = event stream (left), 0 = state stream. */
  final case class In(user_id: Long, ts: java.sql.Timestamp, side: Int,
                      event_id: Long)

  /** One enriched event; `r_*` NULL when no state row was at or before
    * the event (left-outer semantics, like the batch operator). */
  final case class Out(user_id: Long, event_id: Long,
                       ts: java.sql.Timestamp,
                       r_event_id: Option[Long],
                       r_ts: Option[java.sql.Timestamp])

  /** Per-key buffers as (µs, event_id) pairs. */
  final case class St(lefts: List[(Long, Long)],
                      rights: List[(Long, Long)])

  private[streaming] def toUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private[streaming] def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Enrich `left` (event_id, ts, user_id) with the latest `right` row at
    * or before each left ts, per user — emits one [[Out]] per left event
    * once the watermark makes its match final. */
  def asOfEnrich(left: DataFrame, right: DataFrame,
                 watermark: String = "2 hours"): Dataset[Out] = {
    val spark = left.sparkSession
    import spark.implicits._
    def tag(df: DataFrame, side: Int) =
      df.select(col("user_id"), col("ts"), lit(side).as("side"),
        col("event_id"))
    tag(left, 1).unionByName(tag(right, 0))
      .withWatermark("ts", watermark)
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[St]) =>
          val prior = state.getOption.getOrElse(St(Nil, Nil))
          var lefts = prior.lefts
          var rights = prior.rights
          if (!state.hasTimedOut) rows.foreach { e =>
            val t = toUs(e.ts)
            if (e.side == 1) lefts ::= ((t, e.event_id))
            else rights ::= ((t, e.event_id))
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // finality: a left at t resolves only once the wm is STRICTLY
          // past t. Spark's FMGWS input filter (EventTimeTimeout) drops
          // arrivals with ts <= wm, so surviving rights carry rt > wm
          // >= t — no admissible arrival can precede a resolved left.
          // Strict-below (rather than inclusive-at-wm) resolution stays
          // exact even under the weakest documented watermark contract
          // (drop only strictly-older rows); see the scaladoc.
          val (ready, pending) = lefts.partition(_._1 < wmUs)
          val rSorted = rights.sortBy(r => (-r._1, -r._2))
          val out = ready.sortBy(identity).map { case (t, id) =>
            rSorted.find(_._1 <= t) match {
              case Some((rt, rid)) =>
                Out(uid, id, toTs(t), Some(rid), Some(toTs(rt)))
              case None => Out(uid, id, toTs(t), None, None)
            }
          }
          // compact: everything at or before the watermark is superseded
          // by the latest such row (no remaining or future left can see
          // past it); above-watermark rows stay until the horizon passes
          val (future, past) = rights.partition(_._1 > wmUs)
          val keepPast =
            if (past.isEmpty) Nil else List(past.max)
          val newRights = future ::: keepPast
          if (pending.isEmpty && newRights.isEmpty) state.remove()
          else {
            state.update(St(pending, newRights))
            if (pending.nonEmpty)
              // wake when the earliest pending left becomes final;
              // floor-to-ms + fire-strictly-after covers sub-ms times
              state.setTimeoutTimestamp(math.max(
                Math.floorDiv(pending.map(_._1).min, 1000L),
                state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }
  }

  /** Batch twin over the same µs columns — delegates to
    * [[graft.ops.Temporal.asOfJoin]]; the StreamingSpec asserts the two
    * faces agree row-for-row on the same corpus. */
  def asOfEnrichBatch(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"))
    val r = right.groupBy(col("user_id"),
        unix_micros(col("ts")).as("r_ts_us"))
      .agg(max("event_id").as("r_event_id"))
    graft.ops.Temporal.asOfJoin(l, r, Seq("user_id"),
      leftTs = "ts_us", rightTs = "r_ts_us", rightPrefix = "")
  }
}
