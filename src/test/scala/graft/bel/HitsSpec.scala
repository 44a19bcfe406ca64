package graft.bel

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("in-star: the center is the sole authority, the leaves are " +
    "equal hubs; direction decides which side is which") {
    val in = Seq(("l1", "c"), ("l2", "c"), ("l3", "c")).toDF("src", "dst")
    val got = Hits.run(in, iterations = 4)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(got("c")._2 - 1.0) < 1e-12) // authority 1 (normalized)
    assert(math.abs(got("c")._1) < 1e-12)       // no out-edges: hub 0
    val leafHub = 1.0 / math.sqrt(3.0)
    Seq("l1", "l2", "l3").foreach { l =>
      assert(math.abs(got(l)._1 - leafHub) < 1e-12, got.toString)
      assert(math.abs(got(l)._2) < 1e-12)
    }
  }

  test("matches driver-side mutual power iteration on a random digraph") {
    val rnd = new scala.util.Random(47)
    val n = 20
    val edges = (1 to 60).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var h = nodes.map(_ -> 1.0).toMap
    var a = nodes.map(_ -> 0.0).toMap
    val iters = 8
    for (_ <- 1 to iters) {
      val a0 = nodes.map(v =>
        v -> edges.filter(_._2 == v).map(e => h(e._1)).sum).toMap
      val na = math.sqrt(a0.values.map(x => x * x).sum)
      a = a0.map { case (k, x) => k -> (if (na > 0) x / na else 0.0) }
      val h0 = nodes.map(u =>
        u -> edges.filter(_._1 == u).map(e => a(e._2)).sum).toMap
      val nh = math.sqrt(h0.values.map(x => x * x).sum)
      h = h0.map { case (k, x) => k -> (if (nh > 0) x / nh else 0.0) }
    }
    val got = Hits.run(edges.toDF("src", "dst"), iterations = iters)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(got(v)._1 - h(v)) < 1e-9, s"hub $v")
      assert(math.abs(got(v)._2 - a(v)) < 1e-9, s"auth $v")
    }
  }

  test("bad iterations fail fast; null endpoints dropped") {
    intercept[IllegalArgumentException](
      Hits.run(Seq(("a", "b")).toDF("src", "dst"), iterations = 0))
    val withNull = Seq((Some("a"), Some("b")), (None, Some("b")))
      .toDF("src", "dst")
    val got = Hits.run(withNull, iterations = 2)
      .as[(String, Double, Double)].collect().map(_._1).toSet
    assert(got == Set("a", "b"))
  }
}
