package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 harness registrations — the timestamp-drift hardening gates:
  *
  *  - `o7_events_ts`: load-path invariant for the events table. The corpus
  *    generator re-encoded `ts` (TIMESTAMP(NANOS) → timestamp[us]) between
  *    rounds and the old hard-coded conversion silently mis-scaled values;
  *    this gate value-checks the first/last event timestamps (to the
  *    microsecond) and the row count against the oracle reading the SAME
  *    files natively, so any future re-encoding that survives
  *    [[graft.core.Tables.validateSchema]] still cannot shift wall-clock
  *    values unnoticed.
  *  - `j10_asof_tolerance`: the two [[graft.ops.Temporal.asOfJoin]] modes
  *    the original j10 gate leaves dark — `forward = true` ordering and
  *    tolerance-NULL resolution (a match farther than the tolerance
  *    resolves to NULL payloads, it does NOT fall back to a farther row).
  *    Oracle = DuckDB's native forward `ASOF LEFT JOIN` with the tolerance
  *    applied as a post-join CASE, which is exactly the operator's
  *    resolve-then-null contract.
  */
object Round8Queries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map[String, Q](

    // --- Events load-path timestamp invariant -------------------------------
    "o7_events_ts" -> ((s, d) => {
      graft.core.Tables.events(s, d).agg(
        date_format(min(col("ts")).cast("timestamp"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"),
        date_format(max(col("ts")).cast("timestamp"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"),
        count(lit(1)).as("n"))
    }),

    // --- As-of join: forward direction + tolerance-NULL resolution ----------
    // "Next error state at or after each click, if within 10 minutes" —
    // the forward twin of j10's backward hour-lookback. The right side
    // pre-aggregates to one row per (user, µs) so the tie winner is
    // engine-independent (same discipline as j10).
    "j10_asof_tolerance" -> ((s, d) => {
      val ev = graft.core.Tables.events(s, d)
      val tsUs = unix_micros(col("ts").cast("timestamp"))
      val l = ev.filter(col("event_type") === "click")
        .select(col("user_id"), tsUs.as("ts_us"), col("event_id"))
      val r = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), tsUs.as("rts"))
        .agg(max("value").as("err_value"))
      graft.ops.Temporal.asOfJoin(l, r, Seq("user_id"),
        leftTs = "ts_us", rightTs = "rts",
        tolerance = Some(600000000L), forward = true)
    }))

  val oracleSql: Map[String, String] = Map(
    "o7_events_ts" ->
      """SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        |  count(*) AS n
        |FROM events
        |""".stripMargin,
    "j10_asof_tolerance" ->
      """WITH l AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'click'
        |), r AS (
        |  SELECT user_id, epoch_us(ts) AS rts, max(value) AS err_value
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
        |)
        |SELECT l.user_id, l.ts_us, l.event_id,
        |  CASE WHEN r.rts <= l.ts_us + 600000000 THEN r.rts END AS r_rts,
        |  CASE WHEN r.rts <= l.ts_us + 600000000 THEN r.err_value
        |    END AS r_err_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us <= r.rts
        |""".stripMargin)
}
