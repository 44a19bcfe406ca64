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

  /** Driver-side personalized reference: restart + dangling mass to the
    * normalized seed distribution. */
  private def referencePpr(edges: Seq[(String, String)],
                           seeds: Map[String, Double], iters: Int,
                           d: Double = 0.85): Map[String, Double] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val present = seeds.filter(kv => nodes.contains(kv._1))
    val tw = present.values.sum
    val s = nodes.map(v => v -> present.getOrElse(v, 0.0) / tw).toMap
    val out = es.groupBy(_._1).map { case (x, g) => x -> g.size.toDouble }
    var r = s
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val in = es.filter(_._2 == v).map(e => r(e._1) / out(e._1)).sum
        v -> ((1 - d) * s(v) + d * (in + dangling * s(v)))
      }.toMap
    }
    r
  }

  test("personalized: matches the driver reference; off-graph seeds " +
    "ignored; weights normalize; mass stays 1") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d",
      "d" -> "e", "x" -> "y")
    val seeds = Seq(("a", 3.0), ("d", 1.0), ("ghost", 9.0))
      .toDF("node", "weight")
    val got = PageRank.runPersonalized(edges.toDF("src", "dst"), seeds,
        iterations = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = referencePpr(edges, Map("a" -> 3.0, "d" -> 1.0), 6)
    assert(got.keySet === want.keySet)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-10, s"node $k: ${got(k)} vs $w")
    assert(math.abs(got.values.sum - 1.0) < 1e-10)
    // the disconnected x→y island gets rank only via teleport — zero
    // seed mass there means (almost) zero rank
    assert(got("y") < 1e-12 && got("x") < 1e-12)
  }

  test("personalized: seeds frame without a weight column defaults to " +
    "uniform-over-seeds") {
    val edges = Seq("a" -> "b", "b" -> "a", "b" -> "c")
    val got = PageRank.runPersonalized(edges.toDF("src", "dst"),
        Seq("a", "b").toDF("node"), iterations = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = referencePpr(edges, Map("a" -> 1.0, "b" -> 1.0), 4)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-10, s"node $k: ${got(k)} vs $w")
  }

  test("personalized: duplicate seed rows sum their weights") {
    val edges = Seq("a" -> "b", "b" -> "a", "c" -> "a")
    val dup = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0))
      .toDF("node", "weight")
    val merged = Seq(("a", 3.0), ("b", 3.0)).toDF("node", "weight")
    val g1 = PageRank.runPersonalized(edges.toDF("src", "dst"), dup, 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val g2 = PageRank.runPersonalized(edges.toDF("src", "dst"), merged, 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(g1 === g2)
  }

  test("personalized: no seed present in the graph fails fast") {
    val e = Seq("a" -> "b").toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      PageRank.runPersonalized(e, Seq("zzz").toDF("node"), 3)
    }
    assert(ex.getMessage.contains("no seed"))
  }

  /** Driver-side weighted reference: transition mass w / out-strength,
    * parallel edges summed. */
  private def referenceW(edges: Seq[(String, String, Double)], iters: Int,
                         d: Double = 0.85): Map[String, Double] = {
    val es = edges.groupBy(e => (e._1, e._2))
      .map { case ((u, v), g) => (u, v, g.map(_._3).sum) }.toSeq
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = es.groupBy(_._1).map { case (u, g) => u -> g.map(_._3).sum }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val in = es.filter(_._2 == v)
          .map(e => r(e._1) * e._3 / out(e._1)).sum
        v -> ((1 - d) / n + d * (in + dangling / n))
      }.toMap
    }
    r
  }

  test("weighted: transition mass follows edge weights; parallel edges " +
    "sum; matches the driver reference") {
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 2.0),
      ("c", "a", 1.0), ("a", "b", 1.0), // parallel a->b: sums to 4
      ("c", "d", 1.0)) // d dangling
    val got = PageRank.runWeighted(edges.toDF("src", "dst", "weight"),
        "weight", iterations = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = referenceW(edges, 6)
    assert(got.keySet === want.keySet)
    for ((k, w) <- want)
      assert(math.abs(got(k) - w) < 1e-10, s"node $k: ${got(k)} vs $w")
    // b receives 4/5 of a's damped mass, c only 1/5: strict order
    assert(got("b") > got("c"))
    assert(math.abs(got.values.sum - 1.0) < 1e-10)
  }

  test("weighted with unit weights equals the unweighted run on a " +
    "simple (no parallel edges) graph") {
    val simple = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
    val viaW = PageRank.runWeighted(
        simple.map(e => (e._1, e._2, 1.0)).toDF("src", "dst", "weight"),
        "weight", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val uni = ranksOf(simple, iters = 5)
    for ((k, w) <- uni)
      assert(math.abs(viaW(k) - w) < 1e-15, s"node $k")
  }

  test("weighted: non-positive weights fail fast") {
    val e = Seq(("a", "b", 0.0)).toDF("src", "dst", "weight")
    val ex = intercept[IllegalArgumentException] {
      PageRank.runWeighted(e, "weight", 3)
    }
    assert(ex.getMessage.contains("non-positive"))
  }

  test("personalized + weighted compose: restart to seeds, transitions " +
    "by weight") {
    val edges = Seq(("a", "b", 3.0), ("b", "a", 1.0), ("b", "c", 1.0))
    val got = PageRank.runPersonalizedWeighted(
        edges.toDF("src", "dst", "weight"),
        Seq("a").toDF("node"), "weight", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // driver reference with s = delta(a)
    val es = edges
    val nodes = Seq("a", "b", "c")
    val out = es.groupBy(_._1).map { case (u, g) => u -> g.map(_._3).sum }
    val s = Map("a" -> 1.0, "b" -> 0.0, "c" -> 0.0)
    var r = s
    for (_ <- 1 to 5) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { v =>
        val in = es.filter(_._2 == v)
          .map(e => r(e._1) * e._3 / out(e._1)).sum
        v -> (0.15 * s(v) + 0.85 * (in + dangling * s(v)))
      }.toMap
    }
    for ((k, w) <- r)
      assert(math.abs(got(k) - w) < 1e-10, s"node $k: ${got(k)} vs $w")
  }

  test("personalized with every node seeded uniformly equals run()") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
    val allSeeds = Seq("a", "b", "c", "d").toDF("node")
    val ppr = PageRank.runPersonalized(edges.toDF("src", "dst"),
        allSeeds, iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val uni = ranksOf(edges, iters = 5)
    for ((k, w) <- uni)
      assert(math.abs(ppr(k) - w) < 1e-12, s"node $k")
  }
}
