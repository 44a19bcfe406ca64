package graft.bel

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iters: Int = 8)
      : Map[String, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Driver-side reference power iteration (the textbook formulation the
    * distributed plan must reproduce bit-for-bit up to sum order). */
  private def reference(edges: Seq[(String, String)], iters: Int,
                        d: Double = 0.85): Map[String, Double] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = es.groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val in = es.filter(_._2 == v).map(e => r(e._1) / out(e._1)).sum
        v -> ((1 - d) / n + d * (in + dangling / n))
      }.toMap
    }
    r
  }

  test("2-cycle is uniform at any iteration count") {
    val got = ranksOf(Seq("a" -> "b", "b" -> "a"), iters = 5)
    assert(math.abs(got("a") - 0.5) < 1e-12)
    assert(math.abs(got("b") - 0.5) < 1e-12)
  }

  test("matches the driver-side reference on a graph with dangling nodes, " +
    "parallel edges and a self-loop") {
    val edges = Seq(
      "a" -> "b", "a" -> "b", // parallel: must collapse
      "a" -> "c", "b" -> "c", "c" -> "a",
      "c" -> "d", // d is dangling
      "e" -> "e", // self-loop island
      "e" -> "a")
    val got = ranksOf(edges)
    val want = reference(edges, 8)
    assert(got.keySet === want.keySet)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-10, s"node $k: ${got(k)} vs $w")
  }

  test("rank mass stays 1 with dangling redistribution") {
    val got = ranksOf(Seq("a" -> "b", "c" -> "b", "b" -> "d"))
    assert(math.abs(got.values.sum - 1.0) < 1e-10)
  }

  test("empty edge set yields an empty frame, not a crash") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(PageRank.run(empty).count() === 0)
  }
}
