package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located-join half of the partitioning
  * story (SURVEY §4.3: "membership/edge tables bucketed or repartitioned
  * by join key").
  *
  * A table written with `bucketBy(n, key)` exposes
  * `HashPartitioning(key, n)` to the planner on every subsequent scan, so
  * joins and aggregations keyed on the bucket column need NO exchange on
  * that side — at 100 TB this converts every repeated
  * membership⋈pathway / edges⋈nodes join from a full shuffle into a
  * zipped per-bucket join. Bucket-pruned reads also skip files on
  * bucket-key equality predicates. The write itself pays one shuffle
  * (cluster by bucket key) — amortized across every downstream join,
  * which is exactly the trade a warehouse table wants. */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted external parquet table at
    * `path`, registered in the session catalog as `table`. Overwrites any
    * previous registration. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
