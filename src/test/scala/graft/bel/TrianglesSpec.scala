package graft.bel

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Triangles.localTriangles]] against closed-form graphs and a
  * brute-force reference on random graphs. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)]): Map[String, (Long, Long, Double)] =
    Triangles.localTriangles(edges.toDF("src", "dst"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (n, d, t, c) => n -> (d, t, c) }.toMap

  private def brute(edges: Seq[(String, String)]): Map[String, (Long, Long, Double)] = {
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    und.flatMap { case (a, b) => Seq(a, b) }.distinct.map { v =>
      val nb = adj(v).toSeq
      val tri = (for {
        i <- nb.indices; j <- i + 1 until nb.size
        if adj(nb(i)).contains(nb(j))
      } yield 1).size.toLong
      val d = nb.size.toLong
      v -> (d, tri, if (d >= 2) 2.0 * tri / (d * (d - 1)) else 0.0)
    }.toMap
  }

  test("K4: every node has 3 triangles and clustering 1.0") {
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b } yield (a, b)
    val got = run(k4)
    assert(got.keySet == Set("a", "b", "c", "d"))
    got.values.foreach { case (d, t, c) =>
      assert(d == 3L && t == 3L && c == 1.0) }
  }

  test("trees and bipartite graphs have zero triangles") {
    assert(run(Seq(("r", "x"), ("r", "y"), ("x", "z")))
      .values.forall(_._2 == 0L))
    val bip = for { l <- Seq("l1", "l2"); r <- Seq("r1", "r2", "r3") }
      yield (l, r)
    assert(run(bip).values.forall(_._2 == 0L))
  }

  test("self-loops and parallel/reversed duplicate edges are ignored") {
    val got = run(Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"),
      ("c", "a"), ("a", "c")))
    assert(got("a") == ((2L, 1L, 1.0)))
    assert(got("b") == ((2L, 1L, 1.0)))
    assert(got("c") == ((2L, 1L, 1.0)))
  }

  test("random graphs match the brute-force reference exactly") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 3) {
      val n = 30
      val edges = (0 until 120).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}") }
      assert(run(edges) == brute(edges))
    }
  }
}
