package graft.bel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KTrussSpec extends SparkSpec {
  import spark.implicits._

  private def edgesOf(pairs: (String, String)*) =
    pairs.toDF("src", "dst")

  private def got(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  // 4-clique {a,b,c,d}: every edge closes 2 triangles → survives k=4
  private val clique = Seq(("a", "b"), ("a", "c"), ("a", "d"),
    ("b", "c"), ("b", "d"), ("c", "d"))

  test("a 4-clique is its own 4-truss; a pendant triangle peels") {
    val ed = edgesOf(clique ++ Seq(("d", "e"), ("d", "f"), ("e", "f")): _*)
    assert(got(KTruss.run(ed, k = 4)) == clique.toSet)
    // the same graph IS a 3-truss in full (triangle edges have support 1)
    assert(got(KTruss.run(ed, k = 3)) ==
      (clique ++ Seq(("d", "e"), ("d", "f"), ("e", "f"))).toSet)
  }

  test("cascade: a bowtie hub survives round 1 and peels in round 2") {
    // (a,b) sits in two triangles via c and d; the four wing edges each
    // sit in ONE → round 1 peels the wings, round 2 the naked hub
    val bowtie = edgesOf(("a", "b"), ("a", "c"), ("b", "c"),
      ("a", "d"), ("b", "d"))
    assert(got(KTruss.run(bowtie, k = 4)).isEmpty)
    // bounded-round contract: after ONE round only the hub remains
    assert(got(KTruss.run(bowtie, k = 4, maxRounds = 1)) ==
      Set(("a", "b")))
  }

  test("k=2 returns the simple undirected graph unchanged") {
    val ed = edgesOf(("b", "a"), ("a", "b"), ("a", "a"), ("c", "d"))
    assert(got(KTruss.run(ed, k = 2)) == Set(("a", "b"), ("c", "d")))
  }

  test("4-clique minus one edge unravels completely at k=4") {
    val ed = edgesOf(clique.filterNot(_ == (("a", "b"))): _*)
    assert(got(KTruss.run(ed, k = 4)).isEmpty)
    // ... in exactly two rounds: wings first, then the (c,d) spine
    assert(got(KTruss.run(ed, k = 4, maxRounds = 1)) == Set(("c", "d")))
  }

  test("matches a brute-force peel on a random graph for k=3..5") {
    val rnd = new scala.util.Random(41)
    val pairs = (0 until 120).map { _ =>
      val a = rnd.nextInt(18); val b = rnd.nextInt(18)
      (s"n$a", s"n$b")
    }.filter(p => p._1 != p._2).distinct
    val ed = edgesOf(pairs: _*)
    def brute(k: Int): Set[(String, String)] = {
      var es = pairs.map(p =>
        (Seq(p._1, p._2).min, Seq(p._1, p._2).max)).toSet
      var changed = true
      while (changed) {
        val adj = es.toSeq.flatMap(e => Seq(e, (e._2, e._1)))
          .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
        val next = es.filter { case (u, v) =>
          (adj(u) & adj(v)).size >= k - 2
        }
        changed = next != es
        es = next
      }
      es
    }
    for (k <- 3 to 5)
      assert(got(KTruss.run(ed, k)) == brute(k), s"k=$k")
  }

  test("bad params fail fast") {
    intercept[IllegalArgumentException](KTruss.run(edgesOf(("a", "b")), 1))
    intercept[IllegalArgumentException](
      KTruss.run(edgesOf(("a", "b")), 3, maxRounds = 0))
  }
}
