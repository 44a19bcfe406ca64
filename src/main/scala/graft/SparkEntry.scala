package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (gene-set pathway enrichment, reference
    * compath/manager.py:203-236) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("a6_enrich")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries ++ MoreQueries.queries ++ Round3Queries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-hash-specific or approximate: d_simhash, s_lsh_topk). */
  def oracleSql: Map[String, String] =
    Queries.oracleSql ++ MoreQueries.oracleSql ++ Round3Queries.oracleSql
}
