package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Curies

/** The §4.3 optimizer rule: `curie_prefix(c) === lit` must become a
  * pushable StartsWith, and must not change results. */
class CuriePrefixPushdownSpec extends SparkSpec {
  import spark.implicits._

  private lazy val curies = Seq(
    "uniprotkb:P12345", "uniprotkb:Q99999", "chebi:15996", "intact:EBI-1",
    "noprefix", ":leadingcolon", "uniprotkbX:oops", "uniprotkb:a\nb", null
  ).toDF("curie")

  // parquet-backed so ConvertToLocalRelation doesn't fold the filter away
  // before the plan can be inspected
  private lazy val curiesOnDisk = {
    val dir = tmpDir("pushdown") + "/c.parquet"
    curies.write.parquet(dir)
    spark.read.parquet(dir)
  }

  test("rewrite fires: optimized plan has StartsWith, no regexp") {
    val q = curiesOnDisk
      .filter(Curies.curiePrefix(col("curie")) === "uniprotkb")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("StartsWith") || opt.contains("startswith"))
    assert(!opt.toLowerCase.contains("regexp_extract"))
  }

  test("rewrite preserves semantics incl. null / no-colon / empty-prefix") {
    // embedded newline: the DOTALL extract and the StartsWith rewrite must
    // agree (rule-on vs rule-off return the same rows)
    val got = curies
      .filter(Curies.curiePrefix(col("curie")) === "uniprotkb")
      .as[String].collect().sorted
    assert(got === Array("uniprotkb:P12345", "uniprotkb:Q99999",
      "uniprotkb:a\nb"))
    // literal with a colon / empty literal: rule must NOT fire (can never
    // equal a capture of [^:]*), semantics preserved either way
    assert(curies.filter(Curies.curiePrefix(col("curie")) === "a:b")
      .count() === 0)
    assert(curies.filter(Curies.curiePrefix(col("curie")) === "")
      .count() === 0)
  }

  test("filter pushes to the parquet scan as StringStartsWith") {
    val q = curiesOnDisk
      .filter(Curies.curiePrefix(col("curie")) === "chebi")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("StringStartsWith"),
      s"expected pushed StringStartsWith in:\n$physical")
    assert(q.as[String].collect() === Array("chebi:15996"))
  }
}
