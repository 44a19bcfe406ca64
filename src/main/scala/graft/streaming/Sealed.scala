package graft.streaming

import org.apache.spark.sql.streaming.GroupState

/** The watermark-seal scaffolding shared by the per-key ordered-prefix
  * FMGWS operators ([[AnomalyStream]], [[TransitionStream]]): merge the
  * unsealed tail with the batch's arrivals, split at the
  * strict-below-watermark boundary (the [[AsOfStream]] finality
  * argument: surviving arrivals carry event time strictly above the
  * watermark, so nothing can sort before a sealed event; wm floor-
  * rounds from ms, so sub-ms event times seal one conservative tick
  * later, never early), and arm the event-time timeout so the key is
  * re-invoked when its earliest pending event becomes sealable.
  *
  * These subtleties (strict `<` vs the ms-floored watermark, the
  * `max(minPending, wm + 1)` timeout) live in exactly ONE place so a
  * boundary fix cannot silently miss an operator. [[AsOfStream]] and
  * the sessionizer predate this helper and keep their own state shapes
  * (two-sided buffers / session aggregates — not a sealed prefix).
  */
private[streaming] object Sealed {

  /** (sealed prefix sorted by (ts, id), still-pending remainder). */
  def split[E](tail: List[E], incoming: List[E], wmUs: Long)
              (tsOf: E => Long, idOf: E => Long): (List[E], List[E]) = {
    val (ready0, pending) =
      (tail ::: incoming).partition(e => tsOf(e) < wmUs)
    (ready0.sortBy(e => (tsOf(e), idOf(e))), pending)
  }

  /** Wake when the earliest pending event becomes sealable;
    * floor-to-ms + fire-strictly-after covers sub-ms times. */
  def armTimeout[E](state: GroupState[_], pending: List[E])
                   (tsOf: E => Long): Unit =
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(math.max(
        Math.floorDiv(pending.map(tsOf).min, 1000L),
        state.getCurrentWatermarkMs() + 1))
}
