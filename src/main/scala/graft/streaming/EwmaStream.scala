package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.ops.Temporal.ewma]]: the same per-key
  * exponentially weighted mean/variance, emitted continuously. The batch
  * semantics — a sequential fold in the key's `(ts, event_id)` order —
  * need a DEFINITIVE order before a row can be scored (a not-yet-arrived
  * earlier event would change every later state), so a row's stats are
  * final exactly when the watermark moves strictly past its timestamp
  * (the [[AnomalyStream]] finality argument, fold state instead of
  * window state).
  *
  * State per key is O(1) + the above-watermark tail: the sealed prefix
  * collapses into the two running doubles `(m, v)` — the recurrence IS
  * its own summary, nothing like the rolling window's n-observation
  * context is needed — plus the unsealed tail awaiting order. That makes
  * this the cheapest stateful operator in the repo: a bot key costs
  * exactly two doubles of sealed state.
  *
  * Determinism: the sealed prefix folds the identical single-IEEE-op
  * recurrence as the batch face in the identical order, so emitted rows
  * are BIT-equal to the batch face on the sealed prefix (spec-pinned).
  * Null/NaN inputs are dropped before the non-nullable encoder, the
  * [[AnomalyStream]] posture.
  */
object EwmaStream {

  final case class In(user_id: Long, ts: java.sql.Timestamp,
                      event_id: Long, value: Double)

  final case class Obs(ts_us: Long, event_id: Long, x: Double)

  /** Sealed fold state `(m, v)` (valid iff `seeded`) + the unsealed
    * above-watermark tail. */
  final case class St(seeded: Boolean, m: Double, v: Double,
                      tail: List[Obs])

  final case class EwRow(user_id: Long, event_id: Long, value: Double,
                         ewma: Double, ewvar: Double)

  def ewmaStream(events: DataFrame, alpha: Double,
                 watermark: String = "10 minutes"): Dataset[EwRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(alpha > 0.0 && alpha <= 1.0,
      s"ewma needs alpha in (0, 1], got $alpha")
    val compl = 1.0 - alpha
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("double").as("value"))
      // null/NaN: no-evidence rows, dropped pre-encoder (batch face
      // emits them with null stats; windows/states agree row-for-row
      // on everything else)
      .filter(col("value").isNotNull && !isnan(col("value")))
      .withWatermark("ts", watermark)
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, EwRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[St]) =>
          val prior = state.getOption.getOrElse(St(seeded = false, 0.0, 0.0, Nil))
          val incoming =
            if (state.hasTimedOut) Nil
            else rows.map(e =>
              Obs(AsOfStream.toUs(e.ts), e.event_id, e.value)).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = Sealed.split(prior.tail, incoming,
            wmUs)(_.ts_us, _.event_id)
          var seeded = prior.seeded
          var m = prior.m
          var v = prior.v
          val out = ready.map { o =>
            if (!seeded) { seeded = true; m = o.x; v = 0.0 }
            else {
              val diff = o.x - m
              val incr = alpha * diff
              m = m + incr
              v = compl * (v + diff * incr)
            }
            EwRow(uid, o.event_id, o.x, m, v)
          }
          if (pending.isEmpty && !seeded) state.remove()
          else {
            state.update(St(seeded, m, v, pending))
            if (pending.nonEmpty) Sealed.armTimeout(state, pending)(_.ts_us)
          }
          out.iterator
      }
  }
}
