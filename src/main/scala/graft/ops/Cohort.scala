package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: users grouped by the period of their FIRST
  * activity (the cohort), counted in every later period they remain
  * active — the (cohort, periods-since) triangle every product/event
  * analytics surface serves, and the aggregate complement of
  * [[Funnel]]'s per-sequence view (the reference's Action log
  * `models.py:40-134` is the same (actor, action, created) shape,
  * queried there only for latest-action provenance).
  *
  * Semantics: activity periods are `date_trunc(period)` buckets (ISO
  * Monday weeks for "week" — identical truncation in Spark and DuckDB);
  * a user's cohort is their MINIMUM activity period; `period_no` is the
  * whole-period distance from the cohort (0 = the cohort period itself).
  * Counts are exact distinct users — a user active twice in a period
  * counts once.
  *
  * Scale shape: ONE shuffle on the user key. The per-user aggregation
  * computes the cohort (min) and the distinct activity-period set in the
  * same pass — the set is bounded by the calendar (periods in the
  * corpus's time span), not by event volume, the same per-key contract
  * as sessionization — then explodes to (cohort, period_no) rows whose
  * final count is a hash-aggregation over a calendar²-sized domain. The
  * join-back formulation (cohort dim ⋈ activity) would shuffle twice.
  *
  * Output: (cohort, period_no, active_users), cohort a DateType. */
object Cohort {

  def retention(events: DataFrame, keyCol: String = "user_id",
                tsCol: String = "ts", period: String = "week"): DataFrame = {
    require(Seq("week", "month", "day").contains(period),
      s"period must be week|month|day, got $period")
    val perUser = events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("k"),
        date_trunc(period, col(tsCol)).cast("date").as("p"))
      .groupBy("k")
      .agg(min("p").as("cohort"), collect_set("p").as("ps"))
    val periodNo = period match {
      // week buckets are always 7 days apart; month distance is the
      // calendar month delta (months_between on first-of-month is exact)
      case "week" => expr("datediff(p, cohort) div 7")
      case "day" => expr("datediff(p, cohort)").cast("long")
      case "month" => months_between(col("p"), col("cohort")).cast("long")
    }
    perUser
      .select(col("cohort"), explode(col("ps")).as("p"))
      .withColumn("period_no", periodNo)
      .groupBy("cohort", "period_no")
      .agg(count(lit(1)).as("active_users"))
  }
}
