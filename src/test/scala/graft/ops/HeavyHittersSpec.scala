package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def invariants(items: Seq[String], k: Int,
                         partitions: Int): Unit = {
    val df = items.toDF("v").repartition(partitions)
    val hits = Profile.heavyHitters(df.withColumn("g", lit(1)),
        Seq("g"), "v", k)
      .select(explode(col("hits")).as("h"))
      .select(col("h.item"), col("h.est"))
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).map { case (v, xs) =>
      v -> xs.length.toLong }
    val n = items.length.toLong
    assert(hits.size <= k, s"summary exceeded k: ${hits.size}")
    hits.foreach { case (v, est) =>
      val t = exact.getOrElse(v, 0L)
      assert(est <= t, s"over-count $v: $est > $t")
      assert((t - est) * (k + 1) <= n, s"error bound broken for $v")
    }
    exact.foreach { case (v, t) =>
      if (t * (k + 1) > n)
        assert(hits.contains(v), s"guaranteed-heavy '$v' missing")
    }
  }

  test("MG invariants hold on a skewed stream — every partitioning") {
    val items = Seq.fill(400)("the") ++ Seq.fill(150)("of") ++
      Seq.fill(90)("and") ++ (1 to 360).map(i => s"w$i")
    for (p <- Seq(1, 3, 8)) invariants(items, k = 8, partitions = p)
  }

  test("MG invariants hold on a uniform stream (nothing guaranteed " +
    "heavy; summary still bounded and never over-counting)") {
    val items = (1 to 500).map(i => s"u${i % 97}")
    invariants(items, k = 5, partitions = 4)
  }

  test("k = 1 degrades to the majority-candidate (Boyer–Moore) shape") {
    val items = Seq.fill(60)("maj") ++ (1 to 40).map(i => s"x$i")
    invariants(items, k = 1, partitions = 4)
    val hits = Profile.heavyHitters(
        items.toDF("v").withColumn("g", lit(1)), Seq("g"), "v", 1)
      .select(explode(col("hits")).as("h")).select(col("h.item"))
      .as[String].collect()
    assert(hits.toSeq == Seq("maj")) // true count 60 > n/2 = 50
  }

  test("per-group summaries stay independent") {
    val df = (Seq.fill(30)(("a", "hot")) ++
      (1 to 20).map(i => ("a", s"a$i")) ++
      Seq.fill(25)(("b", "warm")) ++ (1 to 10).map(i => ("b", s"b$i")))
      .toDF("g", "v")
    val got = Profile.heavyHitters(df, Seq("g"), "v", 4)
      .select(col("g"), explode(col("hits")).as("h"))
      .select(col("g"), col("h.item"))
      .as[(String, String)].collect().toSet
    assert(got.contains(("a", "hot")) && got.contains(("b", "warm")))
    assert(!got.contains(("b", "hot")) && !got.contains(("a", "warm")))
  }

  test("bad k fails fast; nulls are skipped") {
    intercept[IllegalArgumentException](
      graft.functions.MisraGriesAgg.misraGries(col("v"), 0))
    val df = Seq(Some("x"), None, Some("x"), None).toDF("v")
    val hits = Profile.heavyHitters(df.withColumn("g", lit(1)),
        Seq("g"), "v", 2)
      .select(explode(col("hits")).as("h"))
      .select(col("h.item"), col("h.est")).as[(String, Long)].collect()
    assert(hits.toSeq == Seq(("x", 2L)))
  }
}
