package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Anomaly

/** Streaming face of [[graft.ops.Anomaly.flagOutliers]]: the same
  * rolling z-score flags, emitted continuously. The batch semantics —
  * each event judged against the `n` events strictly preceding it in
  * its key's `(ts, event_id)` order — needs a DEFINITIVE order before an
  * event can be scored (a not-yet-arrived earlier event would change
  * the window), so an event's flag is final exactly when the watermark
  * moves strictly past its timestamp: every surviving future arrival
  * carries event time strictly above the watermark (the
  * [[AsOfStream]] finality argument — `flatMapGroupsWithState` under
  * EventTimeTimeout filters input through `ts <= wm`), so nothing can
  * sort before a sealed event, and the sealed prefix's rolling windows
  * equal the batch face's windows row-for-row.
  *
  * State per key is BOUNDED: the ≤ `n` most recent SEALED observations
  * (the window context the first unsealed event will need — sealed
  * events older than that can never enter another window and leave
  * state immediately) plus the above-watermark tail — O(n + horizon
  * churn), the sessionizer's bound discipline. Event-time timeouts
  * flush a key whose watermark advances without new rows. Rows at or
  * below the watermark on arrival are best-effort by Spark's own
  * contract, same as every stateful operator here.
  */
object AnomalyStream {

  final case class In(user_id: Long, ts: java.sql.Timestamp,
                      event_id: Long, q: Long)

  /** One sealed observation, µs event time (the j10 exactness
    * contract). */
  final case class Obs(ts_us: Long, event_id: Long, q: Long)

  /** `ctx`: the ≤ n most recent sealed observations, ascending —
    * exactly the window seed for the next sealed event. `tail`:
    * unsealed (above-watermark) observations, unordered. */
  final case class St(ctx: List[Obs], tail: List[Obs])

  /** Same columns as the batch face (minus ts, which rides in state
    * only) — the spec asserts face equality on (user_id, event_id). */
  final case class Flag(user_id: Long, event_id: Long, q: Long,
                        cnt: Long, s: Long, ss: Long,
                        is_outlier: Boolean)

  def flagOutliersStream(events: DataFrame, n: Int = 20, k: Int = 3,
                         minN: Int = 8, scale: Long = 1000L,
                         watermark: String = "10 minutes"): Dataset[Flag] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(n >= 1 && k >= 1 && minN >= 2 && scale >= 1,
      s"bad anomaly params: n=$n k=$k minN=$minN scale=$scale")
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        // the batch face's enforced overflow tripwire, shared column
        // (a wrap would silently flip flags here too)
        Anomaly.guardedQ(col("value"), scale, n, k).as("q"))
      // null/NaN values quantize to null q ("no evidence" — guardedQ's
      // null contract). The batch face emits such rows with zero stats
      // and is_outlier = false, and its windows run over evidence rows
      // only; here they are dropped BEFORE the non-nullable encoder
      // (In.q: Long), so windows match the batch face row-for-row —
      // a null row occupies no frame slot on either face — and only
      // the no-evidence rows themselves are absent from the stream
      // output (AnomalySpec pins face equality with a null inside a
      // full frame).
      .filter(col("q").isNotNull)
      .withWatermark("ts", watermark)
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[St, Flag](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[St]) =>
          val prior = state.getOption.getOrElse(St(Nil, Nil))
          val incoming =
            if (state.hasTimedOut) Nil
            else rows.map(e =>
              Obs(AsOfStream.toUs(e.ts), e.event_id, e.q)).toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = Sealed.split(prior.tail, incoming,
            wmUs)(_.ts_us, _.event_id)
          // roll the window seeded by the sealed context; O(n) sums per
          // event keep the code one obviously-correct line per stat
          var win = prior.ctx
          val out = ready.map { o =>
            val cnt = win.size.toLong
            val s = win.iterator.map(_.q).sum
            val ss = win.iterator.map(x => x.q * x.q).sum
            win = (win :+ o).takeRight(n)
            Flag(uid, o.event_id, o.q, cnt, s, ss,
              Anomaly.outlier(o.q, cnt, s, ss, k, minN))
          }
          if (pending.isEmpty && win.isEmpty) state.remove()
          else {
            state.update(St(win, pending))
            Sealed.armTimeout(state, pending)(_.ts_us)
          }
          out.iterator
      }
  }
}
