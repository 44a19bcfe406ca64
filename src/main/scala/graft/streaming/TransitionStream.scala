package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.ops.Funnel.transitionCounts]]: per-key
  * next-event transition observations, emitted continuously. An
  * adjacent pair is final exactly when BOTH its events are sealed —
  * the watermark has moved strictly past the LATER event's timestamp,
  * so no admissible arrival can sort between them (the [[AnomalyStream]]
  * / [[AsOfStream]] finality argument: surviving FMGWS arrivals carry
  * event time strictly above the watermark). Emission is the raw
  * `(from_type, to_type)` observation feed — the counts aggregation
  * composes downstream exactly like the batch face's, and emitting
  * observations (not running counts) keeps the operator append-mode
  * with O(1) retraction-free sink semantics.
  *
  * State per key: the LAST sealed event (the context the next sealed
  * event pairs with) plus the above-watermark tail — O(1 + horizon
  * churn), the sessionizer's bound discipline.
  */
object TransitionStream {

  final case class In(user_id: Long, ts: java.sql.Timestamp,
                      event_id: Long, event_type: String)

  final case class Ev(ts_us: Long, event_id: Long, event_type: String)

  /** `last`: the most recent sealed event (None before any seal);
    * `tail`: unsealed observations, unordered. */
  final case class St(last: Option[Ev], tail: List[Ev])

  final case class Obs(user_id: Long, from_id: Long, to_id: Long,
                       from_type: String, to_type: String)

  def transitionsStream(events: DataFrame,
                        watermark: String = "10 minutes"): Dataset[Obs] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withWatermark("ts", watermark)
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, Obs](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[St]) =>
          val prior = state.getOption.getOrElse(St(None, Nil))
          val incoming =
            if (state.hasTimedOut) Nil
            else rows.map(e =>
              Ev(AsOfStream.toUs(e.ts), e.event_id, e.event_type)).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = Sealed.split(prior.tail, incoming,
            wmUs)(_.ts_us, _.event_id)
          var last = prior.last
          val out = ready.flatMap { e =>
            val o = last.map(p => Obs(uid, p.event_id, e.event_id,
              p.event_type, e.event_type))
            last = Some(e)
            o
          }
          if (pending.isEmpty && last.isEmpty) state.remove()
          else {
            state.update(St(last, pending))
            Sealed.armTimeout(state, pending)(_.ts_us)
          }
          out.iterator
      }
  }
}
