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
    * state never stores event ids/types. */
  final case class TailEv(ts: java.sql.Timestamp, value: Double)

  /** ONE session as O(1) running aggregates: `[session_start, last]` is
    * the event-time span, n/total accumulate. Sessions never split once
    * formed (the events exist; their adjacent distances cannot change),
    * so aggregates suffice — no raw event buffer at all. */
  final case class SessionAgg(session_start: java.sql.Timestamp,
                              last: java.sql.Timestamp,
                              n: Long, total: Double)

  /** Per-key sessionizer state: event-time-ordered, mutually >gap-
    * separated session aggregates. Bounded by the WATERMARK HORIZON, not
    * by session length or event count: a session leaves state once
    * `last + gap < watermark` (no admissible future event can reach it),
    * so at most ~(watermark delay / gap) + 2 aggregates are ever held —
    * and an always-active key (a bot, a scraper, a hot service account
    * whose gaps never exceed the session gap) holds exactly ONE 32-byte
    * aggregate no matter how many events its never-ending session has
    * seen. The previous designs kept the full open-session event list
    * (round 5, unbounded) or a frozen-prefix + raw watermark tail
    * (round 6, bounded but eager-closing on gaps — a legal
    * above-watermark late event could bridge a session that had already
    * been emitted, diverging from the batch face). */
  final case class SessionState(sessions: List[SessionAgg])

  /** File-based streaming source over an events parquet path — the
    * production entry point of the streaming layer (new files landing
    * under the path become micro-batches). `basePath` is pinned to the
    * parent so the source accepts both a directory of part files and a
    * single-file corpus: for a NON-glob path FileStreamSource force-sets
    * `basePath` to the path itself, which must then be a directory — the
    * exact-match `{...}` glob sidesteps that while matching only the
    * events table.
    *
    * The declared stream schema is PROBED from the files (one batch-reader
    * footer read), not hard-coded: a file-stream source trusts whatever
    * StructType it is handed, so a force-declared LongType over a
    * timestamp[us] file would load µs values as raw longs without any
    * error and silently mis-scale every window. The probed schema is
    * validated against the engine's contract, then `ts` is normalized by
    * the SAME single conversion site batch uses
    * ([[graft.core.Tables.normalizeTs]]) and cast to TIMESTAMP for
    * watermark arithmetic. */
  def readStream(spark: SparkSession, dir: String,
                 options: Map[String, String] = Map.empty): DataFrame = {
    val glob = s"$dir/{events.parquet}"
    val fileSchema = spark.read.parquet(glob).schema
    Tables.validateSchema("events", fileSchema)
    val raw = spark.readStream
      .schema(fileSchema)
      .options(options)
      .parquet(glob)
    Tables.normalizeTs(raw)
      .withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }

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

  /** Windowed top-k rows per (window, event_type) — the STREAMING face
    * of [[graft.ops.Rank.topKPerGroup]] ("the 3 biggest events per type
    * per hour, continuously"): the native bounded
    * [[graft.functions.TopKRowsAgg]] buffer IS the streaming
    * aggregation state, so each (window, type) key holds at most k rows
    * in the state store regardless of event volume — the same
    * every-row-through-one-task funnel a streaming
    * `row_number().over(...)` would hit doesn't exist here (windows
    * don't even admit rank functions in streaming). Total order
    * (value, user_id, ts, event_id) descending — event_id makes the
    * top-k SET deterministic under ties, though only
    * (value, user_id) are emitted. Complete mode re-emits the window
    * table; the batch twin is the row_number SQL the gate's oracle
    * runs. */
  def topKPerWindowStream(events: DataFrame, k: Int,
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.TopKRows.topKStructs(
        struct(col("value"), col("user_id"), col("ts"), col("event_id")),
        k, ascending = false).as("__top"))
      .select(col("window.start").as("hour"), col("event_type"),
        explode(col("__top")).as("__r"))
      .select(col("hour"), col("event_type"),
        col("__r.value").as("value"), col("__r.user_id").as("user_id"))

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

  /** Stream-static enrichment: join each micro-batch against a STATIC
    * dimension frame (user → account, id → metadata — the streaming twin
    * of the batch broadcast dict lookup, reference
    * `sources/tfregulons.py`-style symbol grounding). The dimension is
    * explicitly broadcast: the stream side is never shuffled for the
    * join and no join state store exists — each micro-batch probes the
    * broadcast hash table and moves on. Inner join (unmatched events
    * drop, matching the batch face). At 100 TB/day the stream side
    * stays partition-local; a dimension too large to broadcast would
    * instead be bucketized and this becomes a shuffle-on-key join —
    * callers choose by dimension size, the default serves the common
    * dimension-sized lookup. */
  def enrich(events: DataFrame, dim: DataFrame,
             key: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(key) === col(dimKey)).drop(dimKey)

  /** Stream-stream event-time interval join — "each left event with every
    * right event of the same key in its trailing `lookbackMinutes`"
    * (click ↔ recent errors, observation ↔ recent snapshots). The SAME
    * declarative plan is the batch face (a range-bounded equi-join) and
    * the streaming face: with both event-time columns watermarked and the
    * range condition bounding r_ts on BOTH sides, Structured Streaming
    * derives a state horizon for each side — state is evicted as the
    * watermark passes, never unbounded, which is why the two-sided bound
    * is load-bearing (an unbounded "r_ts <= ts" alone would keep every
    * left row forever).
    *
    * Right columns come back `r_`-prefixed (the join key deduplicated).
    * At scale this is one shuffle per side on the key — the equi-key
    * dominates the join, the time range is a post-filter in the same
    * stage, so no range fan-out and no nested-loop plan.
    *
    * `joinType`: "inner" (default) or "left_outer". Outer semantics in a
    * stream are WATERMARK-DRIVEN: a left row with no match emits its
    * null-padded row only once the watermark proves no admissible right
    * row can still arrive (the same two-sided bound that lets state
    * evict is what makes the no-match decision final). Until the
    * watermark passes a row's horizon, its outer result is simply not
    * yet emitted — the batch face emits it immediately. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String = "user_id", lookbackMinutes: Int = 60,
                   watermark: String = "2 hours",
                   joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported interval-join type: $joinType")
    val l = left.withWatermark("ts", watermark)
    val r = right.columns
      .foldLeft(right)((df, c) => df.withColumnRenamed(c, "r_" + c))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col(key) === col("r_" + key) &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $lookbackMinutes MINUTES") &&
        col("r_ts") <= col("ts"),
      joinType)
      .drop("r_" + key)
  }

  /** Stateful sessionization via flatMapGroupsWithState: a session is a
    * run of events per user with gaps < `gapMinutes`. Emits one row per
    * CLOSED session — closed meaning the WATERMARK has passed
    * `last + gap`, so no admissible future event can extend or bridge it
    * (an earlier design emitted on first gap sighting, which a legal
    * above-watermark late event could then bridge — diverging from the
    * batch face). Idle sessions close on EVENT-TIME timeout — the
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
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val prior = state.getOption.map(_.sessions).getOrElse(Nil)
          val incoming =
            if (state.hasTimedOut) Nil
            else rows.map(e => TailEv(e.ts, e.value)).toList
          val wm = state.getCurrentWatermarkMs()
          val (closed, open) = advance(prior, incoming, wm, gapMs)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionState(open))
            // wake when the earliest open session becomes closable
            state.setTimeoutTimestamp(
              math.max(open.map(_.last.getTime).min + gapMs, wm + 1))
          }
          closed.map(c =>
            Session(userId, c.session_start, c.n, c.total)).iterator
      }
  }

  /** One sessionizer step, pure and unit-testable: insert the batch's
    * events into the ordered session-aggregate list, then split off every
    * session the watermark has sealed. Correctness of aggregate-only
    * state: within a session, adjacent events are ≤ gap apart, so a new
    * event e is chain-connected to session s iff
    * `s.start − gap ≤ e.ts ≤ s.last + gap` — landing INSIDE [start, last]
    * always connects (e falls between two adjacent events ≤ gap apart),
    * and the two endpoints cover the within-gap extensions. At most two
    * sessions can touch one event (three would need
    * `third.start − first.last ≤ 2·gap`, impossible at >gap mutual
    * separation); touching sessions merge by min/max/sum — sessions never
    * split once formed, so no raw events are ever needed.
    * Returns (closed sessions, remaining open state), both ordered. */
  private[streaming] def advance(prior: List[SessionAgg],
                                 incoming: List[TailEv],
                                 watermarkMs: Long, gapMs: Long)
      : (List[SessionAgg], List[SessionAgg]) = {
    val sessions = incoming.sortBy(_.ts.getTime).foldLeft(prior) { (ss, e) =>
      val t = e.ts.getTime
      val (before, rest) = ss.span(_.last.getTime + gapMs < t)
      val (touch, after) = rest.span(_.session_start.getTime - gapMs <= t)
      val merged =
        if (touch.isEmpty) SessionAgg(e.ts, e.ts, 1L, e.value)
        else SessionAgg(
          if (touch.head.session_start.getTime <= t) touch.head.session_start
          else e.ts,
          if (touch.last.last.getTime >= t) touch.last.last else e.ts,
          touch.map(_.n).sum + 1L, touch.map(_.total).sum + e.value)
      before ::: merged :: after
    }
    // sealed once last + gap < watermark: every future event has
    // ts ≥ watermark and so cannot reach (or bridge across) this session
    sessions.span(_.last.getTime + gapMs < watermarkMs)
  }

  /** Batch sessionization with identical semantics — lag/gap analysis via
    * window functions (SQL-oracle-checkable; also the cross-check for the
    * streaming path). Returns (user_id, session_start, n_events,
    * total_value).
    *
    * `maxEventsPerKey` is the per-key contract hardener (the funnel's
    * cap, applied to the window face): a bot key's whole history funnels
    * through one window partition — spilling, not OOMing, but a single
    * task still pays the full sort at 100 TB. With a cap set, over-cap
    * keys are pruned before the window ([[graft.core.Skew
    * .underCapOnly]]); surface them via [[graft.core.Skew.overCapKeys]]
    * on the same feed. Default leaves the plan untouched. The STREAM
    * face needs no cap: its state is session AGGREGATES (min/max/count/
    * sum per open session), already O(open sessions), never per-event. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30,
                      maxEventsPerKey: Long = Long.MaxValue): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val gapSec = gapMinutes * 60L
    graft.core.Skew.underCapOnly(events, Seq("user_id"), maxEventsPerKey)
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
