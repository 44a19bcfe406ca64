package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over event-shaped tables — the point-in-time enrichment
  * operators a feature/training pipeline needs ("the last profile snapshot
  * / quote / error state as of each observation") that plain equi-joins
  * cannot express and a naive range join explodes into |L|·|R| per key.
  *
  * [[asOfJoin]] is the classic as-of (point-in-time) join: for each left
  * row, the single right row with the LARGEST right timestamp ≤ the left
  * timestamp (backward; smallest ≥ with `forward = true`), per key, with
  * an optional tolerance bound. The semantics match DuckDB/QuestDB
  * `ASOF JOIN` and pandas `merge_asof`.
  *
  * Scale shape (the reason this is NOT a join in the plan): both sides are
  * tagged and UNIONED, then resolved with ONE window pass — a single
  * shuffle on the key, a per-key sort, and an O(1)-per-row running
  * `last(ignoreNulls)` frame. The alternatives either explode (inequality
  * theta-join → BroadcastNestedLoop at cluster scale) or double-shuffle
  * (range-bucketed join, which also needs a tolerance to bucket by).
  * Sorting is per-key-partition — range partition on (key) only, never a
  * global single-partition sort; a pathologically hot key funnels its OWN
  * rows through one sorted partition, the same contract as any
  * sessionization/window pass over that key.
  */
object Temporal {

  /** Shared fail-fast for the operators whose arithmetic needs a numeric
    * (µs-epoch-style) timestamp column. */
  private def requireNumericTs(op: String, colName: String,
                               t: org.apache.spark.sql.types.DataType): Unit =
    require(t.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$op needs a NUMERIC ts column (µs epochs etc.); " +
        s"'$colName' is ${t.sql}")

  /** Stricter fail-fast for the grid operators ([[resampleFfill]],
    * [[twapBuckets]]) whose integer grid arithmetic `cast("long")`s the
    * ts column: a FRACTIONAL numeric ts would truncate toward zero there
    * — rounding negative (pre-epoch) values UP, off the floor-true grid
    * the [[floorDivSql]] contract promises. Integral widths only. */
  private def requireIntegralTs(op: String, colName: String,
                                t: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types._
    require(Seq(LongType, IntegerType, ShortType, ByteType).contains(t),
      s"$op needs an INTEGRAL ts column (µs epochs — LONG/INT); " +
        s"fractional types would truncate off the floor-true grid; " +
        s"'$colName' is ${t.sql}")
  }

  /** SQL fragment for floor division `e div n` that is a TRUE floor for
    * negative values too (`div` alone truncates toward zero, which would
    * mis-bucket pre-epoch timestamps): the pmod subtraction makes the
    * numerator an exact multiple of `n`, so truncation equals floor. */
  private def floorDivSql(e: String, n: Long): String =
    s"((($e) - pmod(($e), ${n}L)) div ${n}L)"

  /** Point-in-time join: each left row picks the latest right row at or
    * before (backward) / earliest at or after (forward) its timestamp,
    * per `keys`. Right payload columns are emitted `rightPrefix`-renamed;
    * left rows with no admissible match keep NULL payloads (left-outer
    * semantics, like `ASOF LEFT JOIN`).
    *
    *  - `tolerance`: optional maximum |left ts − right ts| in the ts
    *    column's OWN units (requires a numeric ts column, e.g.
    *    `unix_micros(ts)`); matches farther than this resolve to NULL.
    *  - Ties: right rows sharing (keys, ts) resolve deterministically —
    *    the xxhash64-max payload wins regardless of partitioning; rows
    *    tied with the left timestamp DO match (inclusive bound, DuckDB
    *    parity) unless `strict = true` (pandas
    *    `allow_exact_matches=False`): then an equal-ts right row is NOT
    *    admissible and the match is strictly before/after.
    *  - Left and right timestamp columns must be the same (orderable)
    *    type; a NULL left ts matches nothing, NULL right ts rows never
    *    match anything.
    *
    * Output: every left column unchanged, then one `rightPrefix`-prefixed
    * column per non-key right column (the right ts included). */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String = "ts", rightTs: String = "ts",
               rightPrefix: String = "r_",
               tolerance: Option[Long] = None,
               forward: Boolean = false,
               strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payload = right.columns.filterNot(keys.contains).toSeq
    require(payload.contains(rightTs), s"right ts column $rightTs missing")
    val lu = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val ru = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__r")): _*)
      .filter(col("__ts").isNotNull)
    // Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1:
    // the inclusive ≤/≥ bound), and equal-(ts,side) right rows order by
    // payload hash, so "last in frame" is partitioning-independent.
    // `strict` flips the side order: left rows sort FIRST at an equal
    // timestamp, so the running frame has not yet seen the equal-ts right
    // row — the exclusive </> bound falls out of the sort, no extra pass.
    val sideOrd = if (strict) col("__side").desc else col("__side").asc
    val ord =
      if (forward) Seq(col("__ts").desc_nulls_last, sideOrd,
        xxhash64(col("__r")).asc)
      else Seq(col("__ts").asc_nulls_first, sideOrd,
        xxhash64(col("__r")).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__r"), ignoreNulls = true).over(w)
    val inTol: Column => Column = m => tolerance match {
      case None => m
      case Some(t) =>
        val rts = m.getField(rightTs)
        when(if (forward) rts <= col("__ts") + t
             else rts >= col("__ts") - t, m)
    }
    lu.unionByName(ru, allowMissingColumns = true)
      // NULL left ts matches nothing (without the guard, the desc ordering
      // of the forward direction would hand null-ts rows the whole frame)
      .withColumn("__m", when(col("__ts").isNotNull, inTol(matched)))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }

  /** Broadcast as-of join — the dimension-sized-right specialization of
    * [[asOfJoin]]: when the state-history side fits a broadcast (user
    * segments, instrument reference data — the common feature-store
    * shape), the event side should pay NOTHING: no shuffle, no per-key
    * sort, no window. The window formulation shuffles BOTH sides on the
    * key; at 100 TB of events against a dimension-sized history that
    * exchange of the event table is the entire cost of the query.
    *
    * Plan shape: the right side compacts to ONE row per key (sorted
    * state array, `collect_list` + `sort_array` — the only shuffle, over
    * the dimension), broadcast-joins the left, and each event resolves
    * in-row with codegen'd array `filter` + `element_at` — a linear scan
    * of that key's states, fine by the broadcast contract (per-key
    * history is small when the whole side broadcasts). The left side
    * stays narrow end-to-end (plan-pinned in PlanShapeSpec).
    *
    * Semantics match [[asOfJoin]] (backward/forward, inclusive bound or
    * `strict`, optional `tolerance` in ts units, left-outer NULLs, NULL
    * left ts matches nothing) with one tie difference: right rows
    * sharing (keys, ts) resolve by full-struct sort order rather than
    * payload-hash — both deterministic under any partitioning; callers
    * wanting cross-engine tie parity pre-aggregate per (keys, ts), the
    * j10 discipline. */
  def asOfJoinBroadcast(left: DataFrame, right: DataFrame,
                        keys: Seq[String],
                        leftTs: String = "ts", rightTs: String = "ts",
                        rightPrefix: String = "r_",
                        tolerance: Option[Long] = None,
                        forward: Boolean = false,
                        strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payload = right.columns.filterNot(keys.contains).toSeq
    require(payload.contains(rightTs), s"right ts column $rightTs missing")
    val states = right
      .filter(col(rightTs).isNotNull)
      .select(keys.map(col) :+ struct(col(rightTs).as("__rts"),
        struct(payload.map(col): _*).as("__p")).as("__s"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(col("__s"))).as("__states"))
    val lts = col(leftTs)
    val admissible: Column => Column = s => {
      val rts = s.getField("__rts")
      val dir =
        if (forward) { if (strict) rts > lts else rts >= lts }
        else { if (strict) rts < lts else rts <= lts }
      tolerance match {
        case None => dir
        case Some(t) =>
          dir && (if (forward) rts <= lts + t else rts >= lts - t)
      }
    }
    val adm = filter(col("__states"), admissible)
    val pick = element_at(adm, if (forward) 1 else -1)
    left
      .join(broadcast(states), keys, "left")
      .withColumn("__m",
        when(lts.isNotNull && size(adm) > 0, pick.getField("__p")))
      .select(left.columns.map(col) ++
        payload.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }

  /** Nearest-mode as-of join (pandas `merge_asof(direction='nearest')`):
    * each left row picks the right row whose timestamp is CLOSEST in
    * either direction, per key; equidistant candidates resolve backward
    * (the past wins over the future — the causally safe default for
    * feature enrichment). Requires a NUMERIC ts column (µs epochs etc.),
    * because candidate selection compares |left − right| distances.
    *
    * Same scale shape as [[asOfJoin]]: one shuffle on the key, then two
    * per-key window passes (ascending for the backward candidate,
    * descending for the forward one) sharing the single exchange — still
    * no range explosion and no BroadcastNestedLoop. Tolerance and tie
    * semantics within each direction match [[asOfJoin]]. */
  def asOfJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String = "ts", rightTs: String = "ts",
                      rightPrefix: String = "r_",
                      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payload = right.columns.filterNot(keys.contains).toSeq
    require(payload.contains(rightTs), s"right ts column $rightTs missing")
    // fail fast on the documented numeric-ts contract — with timestamp
    // columns the distance arithmetic would otherwise run via interval
    // comparisons without tolerance, and with one it would die late with
    // a confusing timestamp+bigint analysis error
    requireNumericTs("asOfJoinNearest", leftTs, left.schema(leftTs).dataType)
    requireNumericTs("asOfJoinNearest", rightTs,
      right.schema(rightTs).dataType)
    val lu = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val ru = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__r")): _*)
      .filter(col("__ts").isNotNull)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc,
        xxhash64(col("__r")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc_nulls_last, col("__side").asc,
        xxhash64(col("__r")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inTol: (Column, Boolean) => Column = (m, fwd) => tolerance match {
      case None => m
      case Some(t) =>
        val rts = m.getField(rightTs)
        when(if (fwd) rts <= col("__ts") + t else rts >= col("__ts") - t, m)
    }
    lu.unionByName(ru, allowMissingColumns = true)
      .withColumn("__mb", when(col("__ts").isNotNull,
        inTol(last(col("__r"), ignoreNulls = true).over(wB), false)))
      .withColumn("__mf", when(col("__ts").isNotNull,
        inTol(last(col("__r"), ignoreNulls = true).over(wF), true)))
      .filter(col("__side") === 1)
      // nearest pick: missing side loses; equidistant resolves backward
      .withColumn("__m", when(col("__mb").isNull, col("__mf"))
        .when(col("__mf").isNull, col("__mb"))
        .when(col("__mf").getField(rightTs) - col("__ts") <
          col("__ts") - col("__mb").getField(rightTs), col("__mf"))
        .otherwise(col("__mb")))
      .select(left.columns.map(col) ++
        payload.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }

  /** Slowly-changing-dimension (type 2) interval build: compress a
    * per-key event stream into validity intervals during which a tracked
    * attribute was constant — `(keys…, attrCol, valid_from, valid_to)`
    * with `valid_to` NULL on the currently-open interval. This is the
    * feature-store / dimension-history operator: the as-of join's natural
    * build-side ("what was the user's segment AT time t" enriches against
    * exactly these intervals).
    *
    * Consecutive events carrying the SAME attribute value extend the
    * open interval instead of starting a new one (the SCD2 compression
    * step); an attribute change closes the previous interval at the new
    * event's timestamp (half-open [from, to) semantics, no gaps).
    *
    * Scale shape: one shuffle on the key, one per-key sort shared by the
    * two window passes (change-detection lag + interval-close lead).
    * Events sharing (keys, ts) must be pre-aggregated to one row by the
    * caller — interval semantics are undefined under same-instant
    * conflicting values, and the `require`-free contract here mirrors
    * the other window operators (garbage ordering in, garbage out). */
  def scd2(events: DataFrame, keys: Seq[String], tsCol: String,
           attrCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    val changed = events
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      .withColumn("__rn", row_number().over(byKey))
      // first row per key, or any value transition (null-safe: a NULL
      // attribute is a tracked state, not a missing row)
      .filter(!(col(attrCol) <=> col("__prev")) || col("__rn") === 1)
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select(keys.map(col) ++ Seq(col(attrCol),
        col("valid_from"), col("valid_to")): _*)
  }

  /** Rolling time-range aggregates: per key, for every event, the count
    * and sum of an INTEGER measure over the trailing `windowSize` ts
    * units (RANGE frame [ts − windowSize, ts], both ends inclusive).
    * One shuffle + one per-key sort; the frame is evaluated by Spark's
    * sliding-frame aggregation, O(1) amortized per row. The integer
    * measure is a contract, not a limitation: trailing-window sums of
    * floats are order-sensitive in any engine, so callers quantize first
    * (cents, micros) and divide after — which also makes results
    * engine-portable bit-for-bit. */
  def rollingSum(df: DataFrame, keys: Seq[String], tsCol: String,
                 valueCol: String, windowSize: Long): DataFrame = {
    require(keys.nonEmpty, "rollingSum needs at least one key column")
    require(windowSize >= 0, s"windowSize must be >= 0, got $windowSize")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
      .rangeBetween(-windowSize, 0)
    df.withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
  }

  /** Time-series resample + forward-fill: project each key's observation
    * stream onto a fixed `stepUs` grid, each grid instant carrying the
    * latest observation at or before it (pandas `asfreq` + `ffill`, the
    * feature-store "state as of every day/hour" export). This is pure
    * composition: per-key grid generation + the backward [[asOfJoin]] —
    * no interval join, no per-grid-point scan.
    *
    * The grid spans `ceil(min ts / step) · step` to `max ts` per key
    * (integer arithmetic, engine-exact); a key whose observations all
    * fall strictly between two grid lines contributes no rows. Since the
    * grid starts at or after the key's first observation, every grid
    * instant has a fill — the left-outer NULLs of the underlying as-of
    * can only appear if callers later widen the grid bounds.
    *
    * Scale shape: one aggregation for the per-key bounds (dimension-sized
    * output), the grid explode fans out bounded by range/step, and the
    * as-of resolves with its single key-shuffle window pass. The derived
    * sequence is staged in its own projection before `explode` (the
    * measured generator-child staging rule). Requires an INTEGRAL ts
    * column (µs epochs etc.) — grid arithmetic is integer division.
    * Output: keys…, `grid_ts`, then every non-key observation column
    * `rightPrefix`-renamed (the observation ts included). */
  def resampleFfill(df: DataFrame, keys: Seq[String], tsCol: String,
                    stepUs: Long, rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "resampleFfill needs at least one key column")
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    requireIntegralTs("resampleFfill", tsCol, df.schema(tsCol).dataType)
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).cast("long").as("__mn"),
        max(col(tsCol)).cast("long").as("__mx"))
    // ceil(mn/step)·step as floorDiv(mn + step - 1, step)·step — the
    // floor-true div keeps pre-epoch (negative) timestamps on the
    // contract grid
    val gridStart = expr(
      s"${floorDivSql(s"__mn + ${stepUs - 1}L", stepUs)} * ${stepUs}L")
    val grid = bounds
      .select(keys.map(col) :+
        when(gridStart <= col("__mx"),
          sequence(gridStart, col("__mx"), lit(stepUs)))
          .otherwise(array().cast("array<long>")).as("__grid"): _*)
      .select(keys.map(col) :+ explode(col("__grid")).as("grid_ts"): _*)
    asOfJoin(grid, df, keys, leftTs = "grid_ts", rightTs = tsCol,
      rightPrefix = rightPrefix)
  }

  /** Resample with LINEAR interpolation — [[resampleFfill]]'s sibling for
    * continuously-varying signals (sensor series, price marks): each
    * on-grid instant between two observations carries
    * `pv + (nv - pv)·(g - pt)/(nt - pt)`; a final observation that lands
    * exactly on the grid contributes itself. The grid is the ffill
    * contract's: multiples of `stepUs` from the key's first observation
    * (rounded up) through its last. Values must be INTEGRAL (quantize
    * first — the [[twapBuckets]] contract), so `interp` is ONE exact
    * integer product/difference chain followed by one IEEE division and
    * one addition — bit-reproducible in any engine, never an
    * accumulation-order artifact. The product `(nv−pv)·(g−pt)` runs in
    * DECIMAL(38,0), not LONG: at production magnitudes (value deltas
    * ~1e8 over day-long µs segments ~8.6e10) the long product exceeds
    * 2⁶³ and would silently wrap under non-ANSI Spark while the oracle
    * computes exactly — decimal keeps every product up to 10³⁸ exact,
    * and a (physically absurd) overflow past that surfaces as NULL, a
    * visible divergence instead of a wrong number. Callers
    * pre-aggregate to one row per (keys, ts); same-instant duplicates
    * are dropped defensively.
    *
    * Scale shape: ONE key-shuffle (the `lead` window) and nothing else —
    * unlike the ffill (grid ⋈ observations as-of), the interpolation
    * needs BOTH bracketing neighbors, so the segment form `[ts, nxt)`
    * IS the join: each segment emits its interior grid points directly,
    * fan-out bounded by segment_length/step, staged in its own
    * projection before `explode`. No join, no second shuffle.
    * Output: keys…, `grid_ts` (µs), `interp` (double). */
  def resampleInterp(df: DataFrame, keys: Seq[String], tsCol: String,
                     valueCol: String, stepUs: Long): DataFrame = {
    require(keys.nonEmpty, "resampleInterp needs at least one key column")
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    requireIntegralTs("resampleInterp", tsCol, df.schema(tsCol).dataType)
    require(Seq("BIGINT", "INT", "SMALLINT", "TINYINT")
      .contains(df.schema(valueCol).dataType.sql),
      s"resampleInterp needs an INTEGRAL value column (quantize first — " +
        s"cents/micros); '$valueCol' is ${df.schema(valueCol).dataType.sql}")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__ts").asc)
    val seg = df
      .select(keys.map(col) ++ Seq(col(tsCol).cast("long").as("__ts"),
        col(valueCol).cast("long").as("__v")): _*)
      .withColumn("__nxt", lead(col("__ts"), 1).over(w))
      .withColumn("__nv", lead(col("__v"), 1).over(w))
    // interior grid indices of [ts, nxt): ceil(ts/step) .. floor((nxt-1)/step)
    val g0 = expr(floorDivSql(s"__ts + ${stepUs - 1}L", stepUs))
    val g1 = expr(floorDivSql("__nxt - 1", stepUs))
    val staged = seg.filter(col("__nxt") > col("__ts"))
      .withColumn("__gspan", when(g0 <= g1, sequence(g0, g1))
        .otherwise(array().cast("array<long>")))
    val interior = staged
      .select(keys.map(col) ++ Seq(col("__ts"), col("__v"), col("__nxt"),
        col("__nv"), explode(col("__gspan")).as("__gi")): _*)
      .withColumn("grid_ts", col("__gi") * stepUs)
      .select(keys.map(col) ++ Seq(col("grid_ts"),
        (col("__v").cast("double") +
          ((col("__nv").cast("decimal(38,0)") -
            col("__v").cast("decimal(38,0)")) *
            (col("grid_ts").cast("decimal(38,0)") -
              col("__ts").cast("decimal(38,0)")))
            .cast("double") /
          (col("__nxt") - col("__ts")).cast("double")).as("interp")): _*)
    // the trailing observation opens no segment; it appears iff on-grid
    val fin = seg.filter(col("__nxt").isNull && col("__ts") % stepUs === 0)
      .select(keys.map(col) ++ Seq(col("__ts").as("grid_ts"),
        col("__v").cast("double").as("interp")): _*)
    interior.unionByName(fin)
  }

  /** Time-weighted aggregation onto fixed buckets (the TWAP/feature-store
    * "average state per hour" export): each observation opens a
    * piecewise-constant segment `[ts, next_ts)` carrying its value; every
    * `stepUs` bucket a segment overlaps receives `value · overlap_µs`.
    * Output per (keys…, bucket): `bucket_ts` (bucket start, µs),
    * `weighted_us` = Σ value·dt and `covered_us` = Σ dt — both EXACT
    * integers (the integer-measure contract of [[rollingSum]]: quantize
    * values first, divide `weighted_us / covered_us` after), so the
    * result is engine-bit-exact, never a float-order artifact. The
    * trailing observation opens no segment (state beyond the last
    * observation is unknown); buckets report their covered duration so
    * partially-covered buckets are visible to the consumer.
    *
    * Scale shape: one key-shuffle for the `lead` segment build, a
    * bucket-span explode bounded by segment_length/step (staged in its
    * own projection — the [[rangeJoin]] grid discipline), and one
    * hash-aggregation on (keys, bucket) — two shuffles total, no join,
    * no interval explosion. Observations must be pre-aggregated to one
    * row per (keys, ts) — same-instant duplicates are dropped
    * defensively (zero-length segments carry no mass). Requires an
    * INTEGRAL ts column and an integral value column. */
  def twapBuckets(df: DataFrame, keys: Seq[String], tsCol: String,
                  valueCol: String, stepUs: Long): DataFrame = {
    require(keys.nonEmpty, "twapBuckets needs at least one key column")
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    requireIntegralTs("twapBuckets", tsCol, df.schema(tsCol).dataType)
    require(Seq("BIGINT", "INT", "SMALLINT", "TINYINT")
      .contains(df.schema(valueCol).dataType.sql),
      s"twapBuckets needs an INTEGRAL value column (quantize first — " +
        s"cents/micros); '$valueCol' is ${df.schema(valueCol).dataType.sql}")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    // floor-true bucket indices: pre-epoch (negative) timestamps land in
    // their correct buckets and dt stays non-negative
    val seg = df
      .withColumn("__nxt", lead(col(tsCol), 1).over(w))
      .filter(col("__nxt") > col(tsCol)) // drops trailing + zero-length
      .withColumn("__bspan", sequence(
        expr(floorDivSql(s"`$tsCol`", stepUs)),
        expr(floorDivSql("`__nxt` - 1", stepUs))))
    val exploded = seg
      .select(keys.map(col) ++ Seq(col(tsCol).cast("long").as("__ts"),
        col("__nxt").cast("long").as("__nxt"),
        col(valueCol).cast("long").as("__v"),
        explode(col("__bspan")).as("__b")): _*)
    val dt = least(col("__nxt"), (col("__b") + 1) * stepUs) -
      greatest(col("__ts"), col("__b") * stepUs)
    exploded
      .groupBy(keys.map(col) :+ col("__b"): _*)
      .agg(sum(col("__v") * dt).as("weighted_us"),
        sum(dt).as("covered_us"))
      .select(keys.map(col) ++ Seq((col("__b") * stepUs).as("bucket_ts"),
        col("weighted_us"), col("covered_us")): _*)
  }

  /** Interval-overlap (range) join: every (left, right) pair of the same
    * `keys` whose closed intervals [start, end] overlap. Spark plans a
    * raw inequality join as BroadcastNestedLoop — quadratic and
    * cluster-fatal — so this buckets both sides onto a `bucketWidth` grid
    * and equi-joins on (keys, bucket): each interval explodes into the
    * grid cells it covers, candidate pairs meet only in shared cells, and
    * the exact overlap predicate filters inside the join stage.
    *
    * No post-join distinct: a pair sharing several cells is emitted ONLY
    * in its canonical first shared cell (`max` of the two start cells),
    * which both sides of a true overlap always cover — the standard
    * dedup-free bucketed interval join, saving the extra shuffle a
    * `dropDuplicates` would cost at scale.
    *
    * `bucketWidth` trades fan-out for candidate precision: cells ≈ the
    * typical interval length keep the explode factor near 2 while
    * pruning far-apart pairs. Interval bounds must be non-negative longs
    * (µs epochs and the like; `div` truncation would mis-bucket negative
    * values). Output: every left column, then each non-key right column
    * `rightPrefix`-renamed. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftStart: String, leftEnd: String,
                rightStart: String, rightEnd: String,
                bucketWidth: Long, rightPrefix: String = "r_"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def cell(c: String): Column = expr(s"`$c` div ${bucketWidth}L")
    val l = left.withColumn("__b",
      explode(sequence(cell(leftStart), cell(leftEnd))))
    val rPref = right.columns.foldLeft(right)((df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, rightPrefix + c))
    val rs = rightPrefix + rightStart
    val re = rightPrefix + rightEnd
    val r = rPref.withColumn("__b",
      explode(sequence(expr(s"`$rs` div ${bucketWidth}L"),
        expr(s"`$re` div ${bucketWidth}L"))))
    l.join(r, keys :+ "__b")
      .filter(col(leftStart) <= col(re) && col(rs) <= col(leftEnd))
      .filter(col("__b") ===
        greatest(cell(leftStart), expr(s"`$rs` div ${bucketWidth}L")))
      .drop("__b")
  }

  /** Missing-data (gap) intervals per key — the telemetry dual of
    * sessionization: where the sessionizer groups the PRESENT rows, this
    * reports the ABSENCES ("sensor X was silent 14:02–17:45") that
    * downtime audits, backfill planners and resample-quality checks
    * consume. A gap is a consecutive-event pair in the key's time order
    * whose spacing exceeds `minGapSeconds` (strictly — spacing exactly
    * at the threshold is the expected cadence, not a gap; leading/
    * trailing silence has no bounding pair and is out of scope by
    * definition).
    *
    * Exactness: spacing compares `unix_timestamp` SECONDS — the
    * established engine-exact pair with the oracle's
    * `floor(epoch(ts))` (the sessionizer's conversion discipline).
    * Scale shape: ONE per-key window (lag), one filter — the
    * [[graft.ops.Anomaly]] single-window posture; output is bounded by
    * the gap count, not the corpus. Output:
    * (keyCol, gap_start, gap_end, gap_s). */
  def gaps(events: DataFrame, minGapSeconds: Long,
           keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(minGapSeconds >= 1,
      s"minGapSeconds must be positive, got $minGapSeconds")
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(tsCol)
    events
      .select(col(keyCol), col(tsCol))
      .withColumn("__prev", lag(col(tsCol), 1).over(byKey))
      .withColumn("gap_s",
        unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev")))
      .filter(col("__prev").isNotNull && col("gap_s") > minGapSeconds)
      .select(col(keyCol), col("__prev").as("gap_start"),
        col(tsCol).as("gap_end"), col("gap_s"))
  }

  /** Hour-of-day seasonal baseline per key — the diurnal profile a
    * telemetry pipeline compares live traffic against ("is 3 AM volume
    * normal FOR 3 AM"). Values floor-quantize (the [[graft.ops.Anomaly]]
    * exactness posture) and the per-(key, hour) statistics stay exact
    * BIGINTs — count, Σq, Σq² — so mean/σ derive downstream without any
    * float accumulation in the stored profile. ONE map-side-combined
    * aggregation onto the |keys|·24 domain. Output:
    * (keyCol, hod 0–23, n, s, ss). */
  def seasonalProfile(events: DataFrame, keyCol: String = "event_type",
                      tsCol: String = "ts", valueCol: String = "value",
                      scale: Long = 1000L): DataFrame = {
    require(scale >= 1, s"scale must be positive, got $scale")
    events
      .select(col(keyCol), hour(col(tsCol)).as("hod"),
        floor(col(valueCol).cast("double") * scale).cast("long").as("q"))
      .groupBy(keyCol, "hod")
      .agg(count(lit(1)).as("n"), sum("q").as("s"),
        sum(col("q") * col("q")).as("ss"))
  }

  /** Fixed-bucket OHLC downsampling — the telemetry/metrics compaction
    * step beside [[resample]]'s gap-filling: per (key, time bucket) one
    * row with the bucket's first/last/extreme values and exact volume,
    * the shape dashboards and coarse-grained feature stores store
    * instead of raw events.
    *
    * Exactness: open/close/high/low are SELECTIONS of input doubles
    * (no arithmetic — engine-exact); open/close order by the full
    * `(ts, tie)` event order via the native `min/max(struct)` argmin
    * idiom (the tie column makes same-second events deterministic in
    * any engine); volume sums the `floor(value·scale)` BIGINT
    * quantization (the anomaly discipline — a raw double sum is
    * partition-order-dependent); counts exact. Bucket assignment is
    * integer arithmetic on whole epoch seconds, so a sub-second ts
    * truncation can never cross a bucket boundary.
    *
    * Scale shape: ONE map-side-combinable aggregation onto the
    * (key × occupied-bucket) domain — no window, no shuffle beyond the
    * aggregation's own; constant per-group state (four extremes + two
    * sums). Struct-ordered `min_by`/`max_by` plans a SortAggregate
    * (Spark sorts hash-agg-unsupported buffer types by the GROUP key
    * per partition — a streaming, spillable sort, not a window funnel);
    * the partial/final split still combines map-side, so only
    * group-sized rows cross the exchange. Output: (keyCol,
    * bucket_start: epoch s, n, open, high, low, close, sum_q). */
  def downsample(events: DataFrame, bucketSeconds: Long,
                 keyCol: String = "event_type", tsCol: String = "ts",
                 valueCol: String = "value", tieCol: String = "event_id",
                 scale: Long = 1000L): DataFrame = {
    require(bucketSeconds >= 1,
      s"bucketSeconds must be positive, got $bucketSeconds")
    require(scale >= 1, s"scale must be positive, got $scale")
    val sec = unix_timestamp(col(tsCol))
    events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol),
        (sec - pmod(sec, lit(bucketSeconds))).as("bucket_start"),
        struct(col(tsCol), col(tieCol)).as("__ord"),
        col(valueCol).cast("double").as("__v"),
        floor(col(valueCol).cast("double") * scale).cast("long").as("__q"))
      .groupBy(keyCol, "bucket_start")
      .agg(count(lit(1)).as("n"),
        min_by(col("__v"), col("__ord")).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max_by(col("__v"), col("__ord")).as("close"),
        sum(col("__q")).as("sum_q"))
  }

  /** Exponentially weighted moving mean AND variance per key over the
    * event-time order — the time-decay rolling statistic beside the
    * fixed-window faces (w_rolling_sum, flagOutliers): recent
    * observations dominate, old ones decay geometrically. Recurrence
    * (the standard incremental EW form — Finch, "Incremental
    * calculation of weighted mean and variance", 2009):
    *
    *   diff = x − m;  incr = α·diff;
    *   m' = m + incr;  v' = (1−α)·(v + diff·incr)
    *
    * seeded m₁ = x₁, v₁ = 0.
    *
    * EXACTNESS, stated honestly: decay is inherently float, so the
    * contract is ENGINE-DETERMINISM, not integer exactness — every step
    * is a fixed sequence of single IEEE-754 double ops (one subtract,
    * two multiplies, one add for m; one add, one multiply, one multiply
    * for v) applied in the per-key `(ts, tie)` order, so any
    * IEEE-conformant engine folding the same recurrence in the same
    * order reproduces the SAME BITS (the o15_pct_rank posture; the
    * `w_ewma` gate's DuckDB oracle folds it scalar-for-scalar). No
    * `exp`/`ln` — a half-life-parameterized weight would ride libm,
    * whose rounding differs across engines (the prioritySample
    * rationale).
    *
    * Scale shape: a sequential per-key recurrence has no windowable
    * closed form that is both numerically sane and order-exact (the
    * prefix-sum trick divides by (1−α)^i, which overflows at production
    * history lengths), so this is the documented `mapPartitions` last
    * resort — and the RIGHT one: one repartition on the key + one
    * per-partition sort (the secondary-sort pattern), then a single
    * streaming pass with O(1) state per key. No collect_list, no
    * per-key buffer at ANY key volume — a bot key costs time, never
    * memory (stronger than the funnel's cap-and-reject contract).
    * Output: (keyCol, tsCol, tieCol, valueCol, ewma, ewvar) — ONLY the
    * four ordering/identity columns are carried (the projection keeps
    * the repartition + sort narrow); other input columns are dropped —
    * join back on (keyCol, tsCol, tieCol) if they are needed. */
  def ewma(events: DataFrame, alpha: Double,
           keyCol: String = "user_id", tsCol: String = "ts",
           valueCol: String = "value",
           tieCol: String = "event_id"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"ewma needs alpha in (0, 1], got $alpha")
    val compl = 1.0 - alpha
    val proj = events.select(col(keyCol).as("__k"), col(tsCol),
      col(tieCol), col(valueCol).cast("double").as("__x"))
    val sorted = proj.repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col(tsCol), col(tieCol))
    val outSchema = sorted.schema
      .add("ewma", org.apache.spark.sql.types.DoubleType)
      .add("ewvar", org.apache.spark.sql.types.DoubleType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    sorted.mapPartitions { it =>
      var curKey: Any = null
      var started = false
      var seeded = false
      var m = 0.0
      var v = 0.0
      it.map { r =>
        val k = r.get(0)
        if (!started || k != curKey) {
          curKey = k; started = true; seeded = false; m = 0.0; v = 0.0
        }
        // null/NaN value: no evidence — emit null stats, state untouched
        // (the Anomaly.guardedQ contract)
        if (r.isNullAt(3) || r.getDouble(3).isNaN)
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ null :+ null)
        else {
          val x = r.getDouble(3)
          if (!seeded) { seeded = true; m = x; v = 0.0 }
          else {
            val diff = x - m
            val incr = alpha * diff
            m = m + incr
            v = compl * (v + diff * incr)
          }
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ m :+ v)
        }
      }
    }(enc)
      .withColumnRenamed("__k", keyCol)
      .withColumnRenamed("__x", valueCol)
  }
}
