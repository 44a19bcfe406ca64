package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKRows

/** Group-wise ranking without window funnels. */
object Rank {

  /** The k first rows of every group under the lexicographic order of
    * `orderCols` (all ascending, or all descending with
    * `ascending = false`) — the "top 3 orders per customer" shape. All
    * other columns ride along as payload; payload columns also serve as
    * the final tie-breakers (they sit after `orderCols` in the ordering
    * struct), so the result is partitioning-independent whenever the
    * selected columns form a total order (e.g. any unique key present).
    *
    * Scale shape: ONE ObjectHashAggregate on the group keys with
    * map-side partial [[graft.functions.TopKRowsAgg]] buffers — every
    * task prunes its slice to ≤ k rows per group before the exchange,
    * so the shuffle carries `groups × k` rows. The
    * `row_number().over(Window)` formulation this replaces ships and
    * sorts EVERY row of a group in the single task that owns it — the
    * hot-group killer at 100 TB.
    *
    * Mixed per-column directions aren't expressible here (the struct
    * order is all-asc or all-desc); encode a mixed sort by negating the
    * offending numeric column upstream. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[String], k: Int,
                   ascending: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(orderCols.nonEmpty, "topKPerGroup needs at least one order column")
    val payload = df.columns.toSeq
      .filterNot(c => groupCols.contains(c) || orderCols.contains(c))
    val fields = orderCols ++ payload
    df.groupBy(groupCols.map(col): _*)
      .agg(TopKRows.topKStructs(struct(fields.map(col): _*), k, ascending)
        .as("__top"))
      .select(groupCols.map(col) :+ explode(col("__top")).as("__r"): _*)
      .select(groupCols.map(col) ++
        fields.map(c => col(s"__r.`$c`").as(c)): _*)
  }
}
