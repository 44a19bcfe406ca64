package graft.bel

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  private def coreMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle plus pendant: 2-core strips the pendant only") {
    // 1-2-3 triangle, 4 hangs off 3
    val g = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    val core = coreMap(KCore.run(g, k = 2))
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("cascading peel: chain collapses entirely") {
    // path 1-2-3-4-5: every node ends below degree 2 once ends peel
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(KCore.run(g, k = 2).isEmpty)
  }

  test("peel cascade exposes a deeper core") {
    // K4 on {1,2,3,4} plus a tail 4-5-6: 3-core = the K4 exactly
    val g = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 5L, 5L -> 6L)
    val core = coreMap(KCore.run(g, k = 3))
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("self-loops and parallel/reversed edges do not inflate degree") {
    val g = edges(1L -> 1L, 1L -> 2L, 2L -> 1L, 1L -> 2L, 2L -> 3L,
      1L -> 3L)
    // simple graph is the 1-2-3 triangle; every node has degree 2
    val core = coreMap(KCore.run(g, k = 2))
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3 is unattainable: duplicates must not push degree to 3
    assert(KCore.run(g, k = 3).isEmpty)
  }

  test("string node ids work (grouped and joined, never arithmetic)") {
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
      .toDF("src", "dst")
    val core = KCore.run(g, k = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }
}
