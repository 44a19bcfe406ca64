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

  /** File-based streaming source over an events parquet directory. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Tables.events)
      .parquet(s"$dir/events.parquet")
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
      .flatMapGroupsWithState[List[Event], Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[List[Event]]) =>
          if (state.hasTimedOut) {
            val sessions = closeSessions(userId,
              state.getOption.getOrElse(Nil), gapMs, flushAll = true)
            state.remove()
            sessions._1.iterator
          } else {
            val buffered = state.getOption.getOrElse(Nil) ++ rows.toList
            val (closed, open) = closeSessions(userId, buffered, gapMs,
              flushAll = false)
            if (open.nonEmpty) {
              state.update(open)
              val lastTs = open.map(_.ts.getTime).max
              state.setTimeoutTimestamp(
                math.max(lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
            } else state.remove()
            closed.iterator
          }
      }
  }

  /** Split a user's buffered events into closed sessions + the still-open
    * tail. Deterministic given the event list. */
  private def closeSessions(userId: Long, events: List[Event], gapMs: Long,
                            flushAll: Boolean): (List[Session], List[Event]) = {
    if (events.isEmpty) return (Nil, Nil)
    val sorted = events.sortBy(_.ts.getTime)
    val groups = sorted.tail.foldLeft(List(List(sorted.head))) {
      case (acc @ current :: rest, e) =>
        if (e.ts.getTime - current.head.ts.getTime > gapMs)
          List(e) :: acc
        else (e :: current) :: rest
      case (Nil, e) => List(List(e))
    }.map(_.reverse).reverse
    val (closed, open) = if (flushAll) (groups, Nil)
    else (groups.dropRight(1), groups.last)
    (closed.map(g => Session(userId, g.head.ts, g.size.toLong,
      g.map(_.value).sum)), open)
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
