package graft.ops

import org.apache.spark.sql.{DataFrame}
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
  * right degenerate behavior. Overflow bound: `(n·maxq)² < 2⁶³` and
  * `k²·n²·maxq² < 2⁶³` ⇒ `maxq·n < 3·10⁹/k` — at scale=1000 and n=20
  * that admits |value| up to ~5·10⁴·k⁻¹ thousand-units; wider domains
  * lower `scale` or widen to decimal(38,0) (one cast, same plan).
  *
  * Scale shape: ONE shuffle — the per-key window; all three frame
  * aggregates (cnt, s, ss) share a single window frame so they evaluate
  * in one WindowExec pass. `cnt < minN` rows emit `is_outlier = false`
  * (not null): a cold-start key is "no evidence", not "unknown", so
  * downstream filters need no null handling.
  *
  * Streaming face: [[graft.streaming.AnomalyStream]] — same flags,
  * watermark-sealed, O(n + horizon) state per key.
  */
object Anomaly {

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
    events
      .select(col(keyCol), col(tsCol), col(tieCol),
        floor(col(valueCol).cast("double") * scale).cast("long").as("q"))
      // qq staged BEFORE the window: a derived argument would split the
      // frame aggregates into a second WindowExec pass (plan-pinned)
      .withColumn("qq", col("q") * col("q"))
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s", coalesce(sum("q").over(w), lit(0L)))
      .withColumn("ss", coalesce(sum("qq").over(w), lit(0L)))
      .withColumn("is_outlier",
        col("cnt") >= minN && dev * dev > lit(k.toLong * k) * disc)
      .drop("qq")
  }

  /** The pure per-window test, shared verbatim with the streaming face
    * so both faces flag from ONE predicate implementation. */
  private[graft] def outlier(q: Long, cnt: Long, s: Long, ss: Long,
                             k: Int, minN: Int): Boolean = {
    val dev = cnt * q - s
    cnt >= minN && dev * dev > k.toLong * k * (cnt * ss - s * s)
  }
}
