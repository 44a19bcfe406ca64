package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score outlier detection over a keyed event stream — the
  * data-quality tripwire a telemetry/metrics pipeline runs per entity
  * ("this sensor/user/service just emitted a value k sigmas outside its
  * own recent behavior"). Each event is scored against the `n` events
  * PRECEDING it in its key's `(ts, tie)` order — strictly preceding, so
  * an outlier never suppresses its own detection by inflating the
  * window it is judged against.
  *
  * Exactness: values quantize to `q = floor(value·scale)` (floor of an
  * IEEE double is engine-identical) and the sigma test runs entirely in
  * BIGINT algebra — `|x − μ| > k·σ` multiplied through by `cnt²`:
  *
  *   (cnt·q − s)² > k²·(cnt·ss − s²)
  *
  * where `s = Σq`, `ss = Σq²` over the window. No division, no sqrt, no
  * float accumulation — bit-exact against the SQL oracle. A constant
  * history (σ = 0) flags ANY deviation and never flags equality, the
  * right degenerate behavior. Overflow bound — documented AND ENFORCED
  * (non-ANSI BIGINT arithmetic wraps silently, which would flip
  * `is_outlier` instead of erroring): `dev² ≤ 4n²·maxq² < 2⁶³` and
  * `k²·n²·maxq² < 2⁶³` ⇒ `maxq ≤ 3·10⁹/(max(k,2)·n)`; every quantized
  * value rides a lazy in-plan `raise_error` tripwire at that bound (the
  * weightedHops validation posture, but narrow — no extra action), so
  * an out-of-range value SURFACES instead of wrapping. Wider domains
  * lower `scale` or use [[flagSeasonal]]'s decimal(38,0) algebra.
  *
  * Scale shape: ONE shuffle — the per-key window; all three frame
  * aggregates (cnt, s, ss) share a single window frame so they evaluate
  * in one WindowExec pass. `cnt < minN` rows emit `is_outlier = false`
  * (not null): a cold-start key is "no evidence", not "unknown", so
  * downstream filters need no null handling.
  *
  * NULL/NaN CONTRACT (both directions): a null/NaN value is a
  * no-evidence row — it contributes nothing to any window AND occupies
  * no row slot in anyone's frame (the windows run over the evidence
  * rows only, so a null row never displaces a real observation from a
  * full n-row frame — exactly the stream face's windows, which seal
  * evidence observations only). No-evidence rows themselves emit
  * `(cnt, s, ss) = (0, 0, 0)` with `is_outlier = false`: there is no
  * evidence ABOUT them and they ARE no evidence.
  *
  * Streaming face: [[graft.streaming.AnomalyStream]] — same flags,
  * watermark-sealed, O(n + horizon) state per key.
  */
object Anomaly {

  /** Quantize + overflow-guard in one codegen'd projection: `floor(v ·
    * scale)` as a long, wrapped in a lazy `raise_error` at the BIGINT
    * bound `|q| ≤ 3·10⁹ / (max(k,2)·n)` (derivation in the object doc).
    * Shared by both rolling faces so the enforced contract cannot
    * drift between them. */
  private[graft] def qLimit(n: Int, k: Int): Long =
    3000000000L / (math.max(k, 2).toLong * n)

  /** NULL CONTRACT: a null or NaN `value` quantizes to a null `q` and
    * passes through explicitly — "no evidence", not an error (the
    * prioritySample coalesce posture). Only a NON-null out-of-range
    * value trips the guard, so the raised message's `q` suffix is
    * always populated (an infinite value casts to ±Long.MaxValue and
    * errors accurately). */
  private[graft] def guardedQ(value: Column, scale: Long, n: Int,
                              k: Int): Column = {
    val limit = qLimit(n, k)
    val v = value.cast("double")
    val q = floor(v * scale).cast("long")
    // isnan explicitly: a NaN double CASTS to 0L (not null), which would
    // silently count as evidence of value 0
    when(v.isNull || isnan(v), lit(null).cast("long"))
      .when(abs(q) <= limit, q)
      .otherwise(raise_error(concat(
        lit(s"flagOutliers: quantized |value| exceeds the BIGINT overflow " +
          s"bound $limit (scale=$scale, n=$n, k=$k) — the sigma test would " +
          "wrap silently; lower scale, or use flagSeasonal's decimal(38,0) " +
          "algebra: "), q.cast("string"))))
  }

  def flagOutliers(events: DataFrame, n: Int = 20, k: Int = 3,
                   minN: Int = 8, scale: Long = 1000L,
                   keyCol: String = "user_id", tsCol: String = "ts",
                   valueCol: String = "value",
                   tieCol: String = "event_id"): DataFrame = {
    require(n >= 1, s"window size must be positive, got $n")
    require(k >= 1, s"sigma multiplier must be positive, got $k")
    require(minN >= 2, s"minN must be at least 2, got $minN")
    require(scale >= 1, s"scale must be positive, got $scale")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-n, -1)
    val dev = col("cnt") * col("q") - col("s")
    val disc = col("cnt") * col("ss") - col("s") * col("s")
    val staged = events.select(col(keyCol), col(tsCol), col(tieCol),
      guardedQ(col(valueCol), scale, n, k).as("q"))
    // the window runs over EVIDENCE rows only (object-doc null
    // contract): a null-q row in the partition would contribute nothing
    // to s/ss yet still occupy a slot of the n-row frame, displacing a
    // real observation and diverging from the stream face (which seals
    // evidence observations only) whenever a null falls inside a full
    // frame
    val evidence = staged.filter(col("q").isNotNull)
      // qq staged BEFORE the window: a derived argument would split the
      // frame aggregates into a second WindowExec pass (plan-pinned)
      .withColumn("qq", col("q") * col("q"))
      .withColumn("cnt", count(col("q")).over(w))
      .withColumn("s", coalesce(sum("q").over(w), lit(0L)))
      .withColumn("ss", coalesce(sum("qq").over(w), lit(0L)))
      .withColumn("is_outlier",
        col("cnt") >= minN && dev * dev > lit(k.toLong * k) * disc)
      .drop("qq")
    // no-evidence rows ride around the window (zero stats, never
    // flagged) — narrow branch, no shuffle, unioned back for the
    // one-row-per-input contract
    val noEvidence = staged.filter(col("q").isNull)
      .withColumn("cnt", lit(0L))
      .withColumn("s", lit(0L))
      .withColumn("ss", lit(0L))
      .withColumn("is_outlier", lit(false))
    evidence.unionByName(noEvidence)
  }

  /** The pure per-window test, shared verbatim with the streaming face
    * so both faces flag from ONE predicate implementation. */
  private[graft] def outlier(q: Long, cnt: Long, s: Long, ss: Long,
                             k: Int, minN: Int): Boolean = {
    val dev = cnt * q - s
    cnt >= minN && dev * dev > k.toLong * k * (cnt * ss - s * s)
  }

  /** SEASONAL outlier flags: each event scored against its key's
    * hour-of-day baseline ([[Temporal.seasonalProfile]]'s exact
    * (n, Σq, Σq²) moments) instead of its trailing window — "is 3 AM
    * traffic normal FOR 3 AM", the diurnal companion of
    * [[flagOutliers]]. Same sigma test multiplied through by n²:
    *
    *   is_outlier ⇔ n ≥ minN ∧ (n·q − s)² > k²·(n·ss − s²)
    *
    * but in `decimal(38,0)` algebra: a seasonal baseline's `n` is the
    * key's WHOLE history in that hour bucket (corpus-scale, unlike the
    * rolling face's n ≤ 20 window), so BIGINT would overflow at
    * production counts — decimal(38,0) admits `n·maxq + |s| ≤ 3·10¹⁸`
    * (e.g. 10¹² observations of |value| ≤ 10³ at scale 1000), checked
    * EAGERLY against the profile (one action over the dimension-sized
    * profile frame — the weightedHops validation posture; the per-row
    * corpus side then needs only the |q| tripwire). Exactness is
    * preserved: decimal(38,0) arithmetic is exact integer arithmetic,
    * identical in any engine (DuckDB's HUGEINT oracle matches
    * bit-for-bit).
    *
    * An event whose (key, hour) has no profile row — or fewer than
    * `minN` observations — emits `is_outlier = false` with n/s/ss
    * zeroed (the cold-start "no evidence" contract of the rolling
    * face). The profile JOINS BROADCAST (|keys|·24 rows by contract):
    * the corpus never shuffles — one narrow pass end to end.
    *
    * Scoring an event against a profile that includes the event itself
    * is the baseline semantic (profiles are built offline over history
    * and refreshed on a cadence; the one-observation dilution at
    * production n is ~1/n). Streaming face:
    * [[graft.streaming.SeasonalStream]] — same broadcast moment table
    * folded at read, stateless. */
  def flagSeasonal(events: DataFrame, profile: DataFrame, k: Int = 3,
                   minN: Int = 8, scale: Long = 1000L,
                   keyCol: String = "event_type", tsCol: String = "ts",
                   valueCol: String = "value",
                   tieCol: String = "event_id"): DataFrame = {
    require(k >= 1, s"sigma multiplier must be positive, got $k")
    require(minN >= 2, s"minN must be at least 2, got $minN")
    require(scale >= 1, s"scale must be positive, got $scale")
    // eager profile validation: dimension-sized by contract, one tiny
    // action; bounds keep every decimal(38,0) product exact (≤ ~10³⁷)
    val st = profile.agg(
      coalesce(max("n"), lit(0L)),
      coalesce(max(abs(col("s"))), lit(0L)),
      coalesce(max("ss"), lit(0L))).head
    val (maxN, maxAbsS, maxSS) =
      (st.getLong(0), st.getLong(1), st.getLong(2))
    require(BigInt(k) * k * BigInt(maxN) * BigInt(maxSS) <
      BigInt(10).pow(37),
      s"flagSeasonal: k²·max(n)·max(ss) = ${BigInt(k) * k * maxN * maxSS} " +
        "overflows decimal(38,0) — rescale the profile")
    val qLimit = (BigInt(3) * BigInt(10).pow(18) - maxAbsS) /
      BigInt(math.max(maxN, 1L))
    require(qLimit > 0, "flagSeasonal: profile moments too large for " +
      "decimal(38,0) — rescale")
    val limit = qLimit.min(BigInt(Long.MaxValue)).toLong
    val v0 = col(valueCol).cast("double")
    val q0 = floor(v0 * scale).cast("long")
    // null/NaN value ⇒ null q: no-evidence pass-through (guardedQ's
    // contract — NaN CASTS to 0L, so isnan is checked explicitly),
    // never the error branch — so the message suffix is always populated
    val q = when(v0.isNull || isnan(v0), lit(null).cast("long"))
      .when(abs(q0) <= limit, q0)
      .otherwise(raise_error(concat(
        lit(s"flagSeasonal: quantized |value| exceeds the decimal(38,0) " +
          s"bound $limit — rescale: "), q0.cast("string"))))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val scored = events
      .select(col(keyCol), col(tsCol), col(tieCol),
        hour(col(tsCol)).as("hod"), q.as("q"))
      .join(broadcast(profile.select(col(keyCol), col("hod"), col("n"),
        col("s"), col("ss"))), Seq(keyCol, "hod"), "left")
      .select(col(keyCol), col(tsCol), col(tieCol), col("hod"), col("q"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("s"), lit(0L)).as("s"),
        coalesce(col("ss"), lit(0L)).as("ss"))
    val dev = dec(col("n")) * dec(col("q")) - dec(col("s"))
    val disc = dec(col("n")) * dec(col("ss")) - dec(col("s")) * dec(col("s"))
    scored.withColumn("is_outlier", col("q").isNotNull &&
      col("n") >= minN && dev * dev > dec(lit(k.toLong * k)) * disc)
  }
}
