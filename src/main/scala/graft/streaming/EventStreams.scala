package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Tables

/** Structured-Streaming layer (SURVEY §7.6 — an extension beyond the
  * reference, which is batch-only): incremental event processing over the
  * `events` table shape with watermarked windowed aggregation and stateful
  * sessionization.
  *
  * Every transform takes and returns DataFrames, so the SAME logic runs
  * batch (tested against the DuckDB oracle via `sessionizeBatch`) and
  * streaming (tested via MemoryStream) — the two paths must agree, which
  * the suite asserts.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           n_events: Long, total_value: Double)

  /** Per-event payload the sessionizer actually needs (ts + value) — the
    * state never stores event ids/types, so a state row costs 16 bytes per
    * buffered TAIL event, and most of the open session is not buffered at
    * all (see [[SessionAgg]]). */
  final case class TailEv(ts: java.sql.Timestamp, value: Double)

  /** Compacted open-session state: O(1) running aggregates for the FROZEN
    * prefix (events at ts < the watermark — no future row can land among
    * them, Spark drops sub-watermark input before the state function) plus
    * only the watermark-horizon TAIL (events at ts ≥ the watermark, which
    * late arrivals can still interleave with and gap-split).
    *
    * An always-active key — a bot, a scraper, a hot service account whose
    * gap never exceeds the session gap — therefore holds state bounded by
    * (watermark delay × its event rate), NOT by its session length: the
    * previous `GroupState[List[Event]]` kept the entire open session and
    * grew without bound on such keys. Invariants: the frozen prefix exists
    * iff `frozen_n > 0`; consecutive gaps inside frozen∪tail are ≤ gap by
    * construction (splits happen before folding). */
  final case class SessionAgg(session_start: java.sql.Timestamp,
                              frozen_last: java.sql.Timestamp,
                              frozen_n: Long, frozen_total: Double,
                              tail: List[TailEv])

  /** File-based streaming source over an events parquet path — the
    * production entry point of the streaming layer (new files landing
    * under the path become micro-batches). `basePath` is pinned to the
    * parent so the source accepts both a directory of part files and a
    * single-file corpus: for a NON-glob path FileStreamSource force-sets
    * `basePath` to the path itself, which must then be a directory — the
    * exact-match `{...}` glob sidesteps that while matching only the
    * events table. `ts div 1000` converts the raw long-nanosecond column
    * to a microsecond timestamp in integer arithmetic, mirroring
    * [[graft.core.Tables.events]]. */
  def readStream(spark: SparkSession, dir: String,
                 options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .schema(Tables.events)
      .options(options)
      .parquet(s"$dir/{events.parquet}")
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000"))
          .cast(org.apache.spark.sql.types.TimestampType))

  /** Watermarked tumbling-window counts — the streaming face of the
    * registered batch query `w_tumbling_hour`. */
  def windowedCounts(events: DataFrame,
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Watermarked streaming dedup — the stream face of exact dedup:
    * duplicate keys arriving within the watermark horizon are dropped
    * with BOUNDED state (a key's state is evicted once the watermark
    * passes its event time; plain streaming `dropDuplicates` would hold
    * every key ever seen — unbounded at 100 TB). First arrival wins, so
    * with exact-copy duplicates the output is the distinct row set.
    * Batch twin: `dropDuplicates(keys)`. */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stateful sessionization via flatMapGroupsWithState: a session is a
    * run of events per user with gaps < `gapMinutes`. Emits one row per
    * CLOSED session. Idle sessions close on EVENT-TIME timeout — the
    * watermark, not the wall clock, drives state expiry, so results are
    * deterministic and replayable (a processing-time timeout would also
    * keep the micro-batch engine spinning forever on an idle stream). */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30,
                       watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            // the buffered open session timed out whole (frozen∪tail is one
            // session by invariant): emit its aggregate and drop the state
            val out = state.getOption.map { agg =>
              Session(userId, agg.session_start,
                agg.frozen_n + agg.tail.size,
                agg.frozen_total + agg.tail.map(_.value).sum)
            }
            state.remove()
            out.iterator
          } else {
            val incoming = rows.map(e => TailEv(e.ts, e.value)).toList
            val (closed, open) = advance(state.getOption, incoming,
              state.getCurrentWatermarkMs(), gapMs)
            open match {
              case Some(agg) =>
                state.update(agg)
                val lastTs = agg.tail.lastOption.map(_.ts.getTime)
                  .getOrElse(agg.frozen_last.getTime)
                state.setTimeoutTimestamp(
                  math.max(lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
              case None => state.remove()
            }
            closed.map(c => Session(userId, c._1, c._2, c._3)).iterator
          }
      }
  }

  /** One sessionizer step, pure and unit-testable: merge the state's tail
    * with the batch's events, close every gap-separated session except the
    * last, then COMPACT the open remainder — events older than the
    * watermark fold into the O(1) frozen aggregates (no future input can
    * interleave with them), events newer stay buffered as the tail.
    * Returns (closed sessions as (start, n, total), next state). */
  private[streaming] def advance(prior: Option[SessionAgg],
                                 incoming: List[TailEv],
                                 watermarkMs: Long, gapMs: Long)
      : (List[(java.sql.Timestamp, Long, Double)], Option[SessionAgg]) = {
    val merged = (prior.map(_.tail).getOrElse(Nil) ++ incoming)
      .sortBy(_.ts.getTime)
    val closed = List.newBuilder[(java.sql.Timestamp, Long, Double)]
    // does the frozen prefix connect to the merged events? (inserting an
    // event can only SHRINK gaps, so this is decidable from merged.head)
    var frozen = prior.filter(_.frozen_n > 0)
    frozen match {
      case Some(f) if merged.nonEmpty &&
          merged.head.ts.getTime - f.frozen_last.getTime > gapMs =>
        closed += ((f.session_start, f.frozen_n, f.frozen_total))
        frozen = None
      case _ => ()
    }
    // gap-split the merged tail into session groups
    val groups = merged.foldLeft(List.empty[List[TailEv]]) {
      case (Nil, e) => List(List(e))
      case (acc @ current :: rest, e) =>
        if (e.ts.getTime - current.head.ts.getTime > gapMs) List(e) :: acc
        else (e :: current) :: rest
    }.map(_.reverse).reverse
    // frozen (if connected) extends into groups.head; every group but the
    // last closes now — same emit semantics as buffering the full session
    val openGroup: List[TailEv] = groups match {
      case Nil => Nil
      case gs =>
        val toClose = gs.dropRight(1)
        toClose.zipWithIndex.foreach { case (g, i) =>
          frozen match {
            case Some(f) if i == 0 =>
              closed += ((f.session_start, f.frozen_n + g.size,
                f.frozen_total + g.map(_.value).sum))
              frozen = None
            case _ =>
              closed += ((g.head.ts, g.size.toLong, g.map(_.value).sum))
          }
        }
        gs.last
    }
    // compact: fold the sub-watermark prefix of the open group into the
    // frozen aggregates (ts order, so the float-sum order matches batch)
    val (foldable, keep) = openGroup.span(_.ts.getTime < watermarkMs)
    val next = (frozen, foldable, keep) match {
      case (None, Nil, Nil) => None
      case (f, fe, k) =>
        val start = f.map(_.session_start)
          .getOrElse((fe ++ k).head.ts)
        val frozenLast = fe.lastOption.map(_.ts)
          .orElse(f.map(_.frozen_last)).getOrElse(start)
        Some(SessionAgg(start, frozenLast,
          f.map(_.frozen_n).getOrElse(0L) + fe.size,
          f.map(_.frozen_total).getOrElse(0.0) + fe.map(_.value).sum,
          k))
    }
    (closed.result(), next)
  }

  /** Batch sessionization with identical semantics — lag/gap analysis via
    * window functions (SQL-oracle-checkable; also the cross-check for the
    * streaming path). Returns (user_id, session_start, n_events,
    * total_value). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec)
          .cast("int"))
      .withColumn("session_seq",
        sum("new_session").over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min("ts").as("session_start"), count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .drop("session_seq")
  }
}
