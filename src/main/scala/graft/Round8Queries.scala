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
    }),

    // --- SemDeDup-style semantic dedup --------------------------------------
    // Cluster-scoped cosine pruning (the dedup flavor the family was
    // missing): base corpus + deterministically perturbed twins (the
    // d_embed_pairs construction), 16 fixed seed centroids, twins land in
    // their base's cluster at cosine ≈ 1 and must be pruned; far pairs
    // survive. Assignment argmax and the dominance rule are the same IEEE
    // arithmetic in both engines (the cosine loop is sequential in both),
    // so the gate is value-exact on the survivor set.
    "d_semantic_prune" -> ((s, d) => {
      val base = graft.core.Tables.load(s, d, "embeddings")
        .select(col("vec_id"),
          graft.functions.Vectors.toDouble(col("embedding")).as("embedding"))
      // sequenced withColumn, NOT a single select: in a single select
      // Spark 4 lateral-resolves `vec_id` inside the transform lambda to
      // the sibling `vec_id + 1000000` alias, while DuckDB resolves the
      // input column — the two engines would perturb with different ids
      val perturbed = base
        .withColumn("embedding", transform(col("embedding"),
          x => x + lit(0.001) * sin(col("vec_id") * 7)))
        .withColumn("vec_id", col("vec_id") + 1000000)
      val centroids = base.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cid"), col("embedding"))
      graft.ops.Dedup.semanticSurvivors(
        base.unionByName(perturbed), centroids, tau = 0.99)
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
        |""".stripMargin,
    "d_semantic_prune" ->
      """WITH b AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), p AS (
        |  -- inner subquery: DuckDB resolves a sibling alias LATERALLY, so
        |  -- an un-nested `sin(vec_id * 7)` would see vec_id + 1000000
        |  -- while Spark's transform sees the input column
        |  SELECT vec_id + 1000000 AS vec_id, v FROM (
        |    SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x + 0.001 * sin(vec_id * 7)) AS v
        |    FROM embeddings)
        |), u AS (
        |  SELECT * FROM b UNION ALL SELECT * FROM p
        |), c AS (
        |  SELECT vec_id AS cid, v AS cv FROM b WHERE vec_id < 16
        |), assigned AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT u.vec_id, u.v, c.cid,
        |      row_number() OVER (PARTITION BY u.vec_id
        |        ORDER BY list_cosine_similarity(u.v, c.cv) DESC, c.cid ASC)
        |        AS rn
        |    FROM u CROSS JOIN c)
        |  WHERE rn = 1
        |)
        |SELECT a.vec_id AS id, CAST(a.cid AS BIGINT) AS cell
        |FROM assigned a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM assigned o
        |  WHERE o.cid = a.cid AND o.vec_id < a.vec_id
        |    AND list_cosine_similarity(o.v, a.v) >= 0.99)
        |""".stripMargin)
}
