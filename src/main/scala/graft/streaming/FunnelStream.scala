package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.ops.Funnel.perUserReach]]: per-key greedy
  * earliest-chain funnel reaches, emitted continuously. The batch
  * semantics — `stage_ts(i+1)` = earliest stage-(i+1) event STRICTLY
  * after `stage_ts(i)`, events folded in `(ts, stage)` order — need a
  * definitive order before an event can advance the chain (a
  * not-yet-arrived earlier event could claim the slot), so an event
  * participates exactly when the watermark moves strictly past its
  * timestamp (the [[Sealed]] finality argument). The sealed prefix
  * folds through the SAME advance rule as the batch face's `aggregate`
  * state machine, so a reach is emitted at most once per (key, stage)
  * and carries the batch-exact first-reach timestamp.
  *
  * Emission is the raw `(user_id, stage, ts_us)` reach-observation feed
  * — one row the moment a key's chain advances to `stage` (1-based).
  * Funnel counts ([[graft.ops.Funnel.reach]] parity) and conversion
  * lags ([[graft.ops.Funnel.transitionLags]] parity) compose downstream
  * as dimension-sized aggregations over the sink; emitting observations
  * keeps the operator append-mode and retraction-free.
  *
  * State per key: the per-stage first-reach timestamps — O(stages)
  * longs, the sealed-prefix chain context — plus the above-watermark
  * tail (horizon-bounded, the shared [[Sealed]] contract). The chain
  * context is the key's PERMANENT state by the funnel's own semantics
  * (dropping it would restart a returning user's chain and re-emit
  * stage 1); only keys that never advanced and have nothing pending are
  * removed. Same per-key-lifetime class as any per-user profile; the
  * tie-break matches the batch face exactly — `array_sort` on
  * `struct(ts, stage)` there, `(ts_us, stage)` in [[Sealed.split]]
  * here, so same-timestamp events chain identically on both faces. */
object FunnelStream {

  final case class In(user_id: Long, ts: java.sql.Timestamp,
                      event_type: String)

  final case class Ev(ts_us: Long, stage: Int)

  /** `reach(i)` = the µs first-reach time of stage i+1 (None = not
    * reached); `tail`: unsealed observations, unordered. */
  final case class St(reach: List[Option[Long]], tail: List[Ev])

  final case class Reach(user_id: Long, stage: Int, ts_us: Long)

  def reachStream(events: DataFrame, stages: Seq[String],
                  watermark: String = "10 minutes"): Dataset[Reach] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, "funnel stages must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val nStages = stages.size
    val stageIdx = stages.zipWithIndex.toMap
    events
      .filter(col("event_type").isin(stages: _*) && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withWatermark("ts", watermark)
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, Reach](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[St]) =>
          val prior = state.getOption
            .getOrElse(St(List.fill(nStages)(None), Nil))
          val incoming =
            if (state.hasTimedOut) Nil
            else rows.map(e =>
              Ev(AsOfStream.toUs(e.ts), stageIdx(e.event_type))).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = Sealed.split(prior.tail, incoming,
            wmUs)(_.ts_us, _.stage.toLong)
          var reach = prior.reach
          val out = ready.flatMap { e =>
            // the filled prefix IS the chain: the next unreached stage
            // is the first None; an event advances iff it is that stage
            // and strictly later than the previous stage's reach time
            val nextStage = reach.indexWhere(_.isEmpty)
            val advances = e.stage == nextStage &&
              (e.stage == 0 || reach(e.stage - 1).exists(e.ts_us > _))
            if (advances) {
              reach = reach.updated(e.stage, Some(e.ts_us))
              Some(Reach(uid, e.stage + 1, e.ts_us))
            } else None
          }
          if (pending.isEmpty && reach.forall(_.isEmpty)) state.remove()
          else {
            state.update(St(reach, pending))
            Sealed.armTimeout(state, pending)(_.ts_us)
          }
          out.iterator
      }
  }
}
