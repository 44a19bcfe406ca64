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

  test("trussness: K5 edges are 5, bowtie edges 3, a triangle-free " +
    "tail is 2") {
    // K5 on a..e (support 3 per edge → 5-truss), bowtie on p,q,r,s
    // (all trussness 3), pendant tail edge (e, z) in no triangle
    val k5 = for {
      x <- Seq("a", "b", "c", "d", "e"); y <- Seq("a", "b", "c", "d", "e")
      if x < y
    } yield (x, y)
    val bowtie = Seq(("p", "q"), ("p", "r"), ("q", "r"), ("p", "s"),
      ("q", "s"))
    val ed = edgesOf(k5 ++ bowtie ++ Seq(("e", "z")): _*)
    val got = KTruss.trussness(ed)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getInt(2))).toMap
    assert(k5.forall(e => got(e) == 5), s"K5: $got")
    assert(bowtie.forall(e => got(e) == 3), s"bowtie: $got")
    assert(got(("e", "z")) == 2)
    assert(got.size == k5.size + bowtie.size + 1) // every edge labeled once
  }

  test("trussness agrees with run at every k") {
    val rnd = new scala.util.Random(43)
    val pairs = (0 until 100).map { _ =>
      (s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}")
    }.filter(p => p._1 != p._2).distinct
    val ed = edgesOf(pairs: _*)
    val tn = KTruss.trussness(ed)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getInt(2))).toMap
    for (k <- 3 to 6) {
      val truss = got(KTruss.run(ed, k))
      assert(tn.filter(_._2 >= k).keySet == truss, s"k=$k")
    }
  }

  test("trussness caps at maxK truthfully: a (maxK+1)-clique reports " +
    "capped = true, uncapped edges report exact k with capped = false") {
    // K6 has trussness 6; at maxK = 4 its edges hit the cap AND survive
    // the extra (maxK+1)-peel → (4, capped). The bowtie (trussness 3)
    // is measured below the cap → capped = false.
    val k6 = for {
      x <- Seq("a", "b", "c", "d", "e", "f")
      y <- Seq("a", "b", "c", "d", "e", "f")
      if x < y
    } yield (x, y)
    val bowtie = Seq(("p", "q"), ("p", "r"), ("q", "r"), ("p", "s"),
      ("q", "s"))
    val got = KTruss.trussness(edgesOf(k6 ++ bowtie: _*), maxK = 4)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getInt(2), r.getBoolean(3)))).toMap
    assert(k6.forall(e => got(e) == ((4, true))), s"k6: $got")
    assert(bowtie.forall(e => got(e) == ((3, false))), s"bowtie: $got")
  }

  test("trussness at-cap edges whose truss ends exactly at maxK are " +
    "measurements, not caps") {
    // K5 has trussness exactly 5: at maxK = 5 the extra 6-peel drops
    // every edge, so the cap row is a MEASUREMENT (capped = false)
    val k5 = for {
      x <- Seq("a", "b", "c", "d", "e"); y <- Seq("a", "b", "c", "d", "e")
      if x < y
    } yield (x, y)
    val got = KTruss.trussness(edgesOf(k5: _*), maxK = 5)
      .collect().map(r => (r.getInt(2), r.getBoolean(3))).toSet
    assert(got == Set((5, false)))
  }

  test("a round-capped maxK+1 peel is machine-readable: cap_converged " +
    "distinguishes '>= maxK (truncated)' from 'in the (maxK+1)-truss'") {
    // the bowtie's 4-peel needs TWO rounds (hub edge survives round 1,
    // peels in round 2 — the cascade test above); maxRounds = 1
    // truncates it with the hub edge still standing. The k = 3 peel
    // itself converges in its one round (no drops), so only the
    // beyond-peel is truncated.
    val bowtie = Seq(("p", "q"), ("p", "r"), ("q", "r"), ("p", "s"),
      ("q", "s"))
    def run(rounds: Int) = KTruss.trussness(edgesOf(bowtie: _*),
        maxK = 3, maxRounds = rounds)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getInt(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val truncated = run(1)
    // the truncated beyond-peel leaves the hub edge: capped = true with
    // cap_converged = false — "at least maxK, raise maxRounds"
    assert(truncated(("p", "q")) == ((3, true, false)), s"$truncated")
    assert(bowtie.filterNot(_ == (("p", "q")))
      .forall(e => truncated(e) == ((3, false, true))), s"$truncated")
    // with enough rounds the bowtie dissolves at k=4: every edge is an
    // exact measurement, cap_converged = true across the board
    val full = run(50)
    assert(full.values.forall(v => v == ((3, false, true))), s"full: $full")
    // drops are exact in BOTH runs (peeling is monotone): every edge
    // measured below the cap agrees between the two runs
    val measuredT = truncated.filter(!_._2._2).view.mapValues(_._1).toMap
    assert(measuredT.forall { case (e, k) => full(e)._1 == k })
  }

  test("bad params fail fast") {
    intercept[IllegalArgumentException](KTruss.run(edgesOf(("a", "b")), 1))
    intercept[IllegalArgumentException](
      KTruss.run(edgesOf(("a", "b")), 3, maxRounds = 0))
  }
}
