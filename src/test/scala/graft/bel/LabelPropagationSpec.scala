package graft.bel

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def labels(edges: Seq[(String, String)], iters: Int)
      : Map[String, String] =
    LabelPropagation.run(edges.toDF("src", "dst"), iters)
      .as[(String, String)].collect().toMap

  /** Driver-side synchronous reference: per round every node adopts its
    * neighbors' (count desc, label asc) winner from the PREVIOUS round. */
  private def reference(edges: Seq[(String, String)], iters: Int)
      : Map[String, String] = {
    val und = edges.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2)
      .distinct
    val nbrs = und.groupBy(_._1).map { case (u, g) => u -> g.map(_._2) }
    val nodes = und.map(_._1).distinct.sorted
    var l = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      l = nodes.map { n =>
        val counts = nbrs(n).map(l).groupBy(identity)
          .map { case (lab, g) => (lab, g.size) }
        n -> counts.toSeq.minBy { case (lab, c) => (-c, lab) }._1
      }.toMap
    }
    l
  }

  test("two dense cliques joined by one bridge edge settle into two " +
    "communities; matches the driver reference exactly") {
    def clique(p: String, n: Int) = for {
      i <- 0 until n; j <- i + 1 until n
    } yield (s"$p$i", s"$p$j")
    val edges = clique("a", 4) ++ clique("b", 4) :+ ("a0" -> "b0")
    val got = labels(edges, iters = 5)
    assert(got === reference(edges, 5))
    // each clique agrees internally, and the two differ
    assert((1 to 3).forall(i => got(s"a$i") === got("a1")))
    assert((1 to 3).forall(i => got(s"b$i") === got("b1")))
    assert(got("a1") !== got("b1"))
  }

  test("synchronous rounds match the reference on an asymmetric graph " +
    "with tie-breaks, at several iteration counts") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(60)((s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      .filter(e => e._1 != e._2)
    for (iters <- Seq(0, 1, 3, 5))
      assert(labels(edges, iters) === reference(edges, iters),
        s"iters=$iters")
  }

  test("deterministic across partitionings") {
    val edges = (1 to 40).map(i => (s"x${i % 9}", s"x${(i * 3) % 9}"))
      .filter(e => e._1 != e._2)
    val a = LabelPropagation.run(edges.toDF("src", "dst"), 4)
      .as[(String, String)].collect().toMap
    val b = LabelPropagation.run(edges.toDF("src", "dst").repartition(7), 4)
      .as[(String, String)].collect().toMap
    assert(a === b)
  }

  test("zero iterations: every node labels itself; self-loops drop") {
    val got = labels(Seq("a" -> "b", "c" -> "c", "c" -> "a"), 0)
    assert(got === Map("a" -> "a", "b" -> "b", "c" -> "c"))
  }
}
