package graft.bel

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("hops on a path graph: single source") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("src", "dst")
    val got = Bfs.hops(edges, Seq(1L).toDF("seed"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    // 9, 10 unreachable: absent
  }

  test("multi-source takes the minimum over seeds; edges are undirected") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = Bfs.hops(edges, Seq(1L, 5L).toDF("seed"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0))
  }

  test("a seed outside the edge set still reports hops 0") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Bfs.hops(edges, Seq(77L).toDF("seed"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(77L -> 0))
  }

  test("maxDepth truncates the expansion") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Bfs.hops(edges, Seq(1L).toDF("seed"), maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1))
  }

  test("hopsPerSeed keys distances by origin; harmonicCloseness folds " +
    "lcm-exact masses, self-rows excluded") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("seed")
    val per = Bfs.hopsPerSeed(edges, seeds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(per === Map(
      (1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2, (1L, 4L) -> 3,
      (1L, 5L) -> 4,
      (5L, 5L) -> 0, (5L, 4L) -> 1, (5L, 3L) -> 2, (5L, 2L) -> 3,
      (5L, 1L) -> 4))
    val close = Bfs.harmonicCloseness(edges, seeds)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val L = 232792560L
    // node 3 is 2 hops from both landmarks; node 1 only 4 from seed 5
    assert(close(3L) === ((2L, 4L, 1.0)))
    assert(close(1L) === ((1L, 4L, 0.25)))
    assert(close(2L) === ((2L, 4L, (L / 1 + L / 3).toDouble / L)))
    assert(close.keySet === Set(1L, 2L, 3L, 4L, 5L))
    intercept[IllegalArgumentException] {
      Bfs.harmonicCloseness(edges, seeds, maxDepth = 21)
    }
  }

  test("matches brute-force shortest hop counts on a random graph") {
    val rnd = new scala.util.Random(13)
    val n = 60
    val edges = (1 to 150).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val seeds = Seq(0L, 1L, 2L)
    // reference BFS over the undirected adjacency
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      val next = frontier.flatMap(u => adj.getOrElse(u, Set.empty))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> d)
      frontier = next
    }
    val got = Bfs.hops(edges.toDF("src", "dst"), seeds.toDF("seed"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === dist)
  }

  test("weightedHops: min-plus costs prefer the cheap long way round; " +
    "parallel edges keep the min weight; non-positive weights refused; " +
    "random-graph Dijkstra match") {
    import spark.implicits._
    // direct a-c costs 10; a-b-c costs 3 — weighted unwinds the hop win
    val tri = Seq(("a", "b", 1L), ("b", "c", 2L), ("a", "c", 10L),
      ("a", "c", 12L)) // parallel heavier copy must not matter
      .toDF("src", "dst", "w")
    val got = Bfs.weightedHops(tri, Seq("a").toDF("seed"), "w")
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 3L))
    intercept[IllegalArgumentException] {
      Bfs.weightedHops(Seq(("a", "b", 0L)).toDF("src", "dst", "w"),
        Seq("a").toDF("seed"), "w").collect()
    }
    intercept[IllegalArgumentException] { // fractional weights refused
      Bfs.weightedHops(Seq(("a", "b", 1.5)).toDF("src", "dst", "w"),
        Seq("a").toDF("seed"), "w")
    }
    // random graph vs driver-side Dijkstra
    val rnd = new scala.util.Random(17)
    val n = 40
    val edges = (1 to 100).map(_ => (rnd.nextInt(n).toLong,
        rnd.nextInt(n).toLong, rnd.nextInt(9).toLong + 1))
      .filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
    val adj = (edges ++ edges.map(e => (e._2, e._1, e._3)))
      .groupBy(_._1)
      .map { case (k, vs) => k ->
        vs.groupBy(_._2).map { case (v, ws) => v -> ws.map(_._3).min } }
    def dijkstra(s: Long): Map[Long, Long] = {
      val dist = scala.collection.mutable.Map(s -> 0L)
      val pq = scala.collection.mutable.PriorityQueue((0L, s))(
        Ordering.by(-_._1))
      while (pq.nonEmpty) {
        val (dc, u) = pq.dequeue()
        if (dc == dist(u))
          for ((v, w) <- adj.getOrElse(u, Map.empty))
            if (dist.get(v).forall(_ > dc + w)) {
              dist(v) = dc + w; pq.enqueue((dc + w, v))
            }
      }
      dist.toMap
    }
    val gotR = Bfs.weightedHops(edges.toDF("src", "dst", "w"),
        Seq(0L).toDF("seed"), "w", maxHops = 40)
      .as[(Long, Long)].collect().toMap
    assert(gotR === dijkstra(0L))
  }

  test("landmarkBetweenness matches textbook Brandes on a path and on " +
    "a random graph (sampled sources, depth past the eccentricity)") {
    import spark.implicits._
    // path a-b-c-d, source a: δ(c)=σc/σd·(1+0)=1, δ(b)=σb/σc·(1+1)=2
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = Bfs.landmarkBetweenness(path, Seq("a").toDF("seed"),
        maxDepth = 5)
      .as[(String, Double)].collect().toMap
    assert(got.keySet === Set("b", "c", "d"))
    assert(math.abs(got("b") - 2.0) < 1e-12)
    assert(math.abs(got("c") - 1.0) < 1e-12)
    assert(math.abs(got("d") - 0.0) < 1e-12)
    // random graph vs driver-side Brandes restricted to the same seeds
    val rnd = new scala.util.Random(41)
    val n = 30
    val edges = (1 to 70).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val adj = (edges ++ edges.map(_.swap)).distinct.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seeds = Seq(0L, 3L, 7L)
    val want = scala.collection.mutable.Map[Long, Double]()
      .withDefaultValue(0.0)
    for (s <- seeds if adj.contains(s)) {
      // forward BFS: σ, levels, predecessors
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
        .withDefaultValue(0L)
      val preds = scala.collection.mutable.Map[Long, List[Long]]()
        .withDefaultValue(Nil)
      val order = scala.collection.mutable.ArrayBuffer[Long]()
      val queue = scala.collection.mutable.Queue(s)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        order += u
        for (v <- adj.getOrElse(u, Set.empty)) {
          if (!dist.contains(v)) { dist(v) = dist(u) + 1; queue += v }
          if (dist(v) == dist(u) + 1) {
            sigma(v) += sigma(u); preds(v) = u :: preds(v)
          }
        }
      }
      val delta = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      for (w <- order.reverse; u <- preds(w)) {
        delta(u) += sigma(u).toDouble / sigma(w) * (1.0 + delta(w))
      }
      for (v <- order if v != s) want(v) = want(v) + delta(v)
    }
    val gotR = Bfs.landmarkBetweenness(edges.toDF("src", "dst"),
        seeds.toDF("seed"), maxDepth = 12)
      .as[(Long, Double)].collect().toMap
    assert(gotR.keySet === want.keySet)
    for ((k, v) <- want)
      assert(math.abs(gotR(k) - v) < 1e-9, s"node $k: ${gotR(k)} vs $v")
  }

  test("weightedBetweenness: weights move the centrality — the cheap " +
    "2-hop detour's midpoint carries it, the unit-weight shortcut " +
    "zeroes it") {
    import spark.implicits._
    val seeds = Seq("a", "b", "c").toDF("seed")
    // a-b=1, b-c=1, a-c=3: every a↔c shortest path runs through b
    val heavy = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 3L))
      .toDF("src", "dst", "w")
    val got = Bfs.weightedBetweenness(heavy, seeds, "w", rounds = 5)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("b") - 2.0) < 1e-12, got.toString)
    assert(math.abs(got("a")) < 1e-12 && math.abs(got("c")) < 1e-12)
    // unit weights: the direct edge wins, b carries nothing
    val unit = Seq(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L))
      .toDF("src", "dst", "w")
    val got2 = Bfs.weightedBetweenness(unit, seeds, "w", rounds = 5)
      .as[(String, Double)].collect().toMap
    assert(got2.values.forall(v => math.abs(v) < 1e-12), got2.toString)
  }

  test("weightedBetweenness matches the DEFINITIONAL dependency — " +
    "every shortest path enumerated, delta = pair-dependency fractions " +
    "— on a random weighted graph") {
    import spark.implicits._
    // dense-ish and small so every weighted shortest path uses ≤ 12
    // edges (the operator's enforced cap): the bounded recurrence then
    // sits AT its fixpoint and must equal unbounded Dijkstra + full
    // shortest-path enumeration (no Brandes recurrence on the brute
    // side — the check is against the DEFINITION)
    val rnd = new scala.util.Random(43)
    val n = 14
    val edges = (1 to 50).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
      .map { case (a, b) => (a, b, (a + b) % 3 + 1) }
    val wOf = (edges ++ edges.map(e => (e._2, e._1, e._3)))
      .groupBy(e => (e._1, e._2))
      .map { case (k, es) => k -> es.map(_._3).min }
    val adj = wOf.keys.toSeq.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seeds = Seq(0L, 5L, 11L)
    val want = scala.collection.mutable.Map[Long, Double]()
      .withDefaultValue(0.0)
    val reached = scala.collection.mutable.Set[Long]()
    for (s <- seeds if adj.contains(s)) {
      val dist = scala.collection.mutable.Map[Long, Long](s -> 0L)
      val done = scala.collection.mutable.Set[Long]()
      while (dist.exists(kv => !done.contains(kv._1))) {
        val u = dist.filter(kv => !done.contains(kv._1)).minBy(_._2)._1
        done += u
        for (v <- adj.getOrElse(u, Set.empty)) {
          val nd = dist(u) + wOf((u, v))
          if (dist.get(v).forall(_ > nd)) dist(v) = nd
        }
      }
      reached ++= dist.keys.filterNot(_ == s)
      def paths(t: Long): Seq[List[Long]] =
        if (t == s) Seq(List(s))
        else adj.keys.toSeq.filter(u => adj(u).contains(t) &&
            dist.contains(u) && dist(u) + wOf((u, t)) == dist(t))
          .flatMap(u => paths(u).map(t :: _))
      for (t <- dist.keys if t != s) {
        val ps = paths(t)
        for (v <- dist.keys if v != s && v != t) {
          val through = ps.count(_.drop(1).dropRight(1).contains(v))
          if (through > 0) want(v) = want(v) + through.toDouble / ps.size
        }
      }
    }
    val got = Bfs.weightedBetweenness(
        edges.map(e => (e._1, e._2)).toDF("src", "dst")
          .withColumn("w", (col("src") + col("dst")) % 3 + 1),
        seeds.toDF("seed"), "w", rounds = 12)
      .as[(Long, Double)].collect().toMap
    // reached-but-carrying-nothing nodes emit 0.0 (the a38 contract)
    assert(got.keySet === reached)
    for (k <- reached)
      assert(math.abs(got(k) - want(k)) < 1e-9,
        s"node $k: ${got(k)} vs ${want(k)}")
  }

  test("weightedBetweenness: bad params fail fast") {
    import spark.implicits._
    val ed = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("seed")
    intercept[IllegalArgumentException](
      Bfs.weightedBetweenness(ed, seeds, "w", rounds = 0))
    intercept[IllegalArgumentException](
      Bfs.weightedBetweenness(ed, seeds, "w", rounds = 13))
    intercept[IllegalArgumentException](
      Bfs.weightedBetweenness(
        Seq(("a", "b", 1.5)).toDF("src", "dst", "w"), seeds, "w"))
  }

  test("pathCounts: exact σ on a diamond (two shortest paths merge, " +
    "then extend); depth cap stops the expansion; reference match on " +
    "a random graph") {
    import spark.implicits._
    // a -> {b, c} -> d -> e : σ(d) = 2 via b and c, σ(e) = 2
    val diamond = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
      ("d", "e")).toDF("src", "dst")
    val got = Bfs.pathCounts(diamond, Seq("a").toDF("seed"))
      .as[(String, String, Int, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(got === Map("a" -> ((0, 1L)), "b" -> ((1, 1L)),
      "c" -> ((1, 1L)), "d" -> ((2, 2L)), "e" -> ((3, 2L))))
    // depth cap: e (3 hops) vanishes at maxDepth = 2
    val capped = Bfs.pathCounts(diamond, Seq("a").toDF("seed"),
      maxDepth = 2).select("node").as[String].collect().toSet
    assert(capped === Set("a", "b", "c", "d"))
    intercept[IllegalArgumentException] {
      Bfs.pathCounts(diamond, Seq("a").toDF("seed"), maxDepth = 13)
    }
    // random graph vs a driver-side level-synchronous reference
    val rnd = new scala.util.Random(29)
    val n = 40
    val edges = (1 to 90).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val adj = (edges ++ edges.map(_.swap)).distinct.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    def ref(seed: Long, depth: Int): Map[Long, (Int, Long)] = {
      var state = Map(seed -> ((0, 1L)))
      var frontier = Map(seed -> 1L)
      var d = 0
      while (frontier.nonEmpty && d < depth) {
        val contrib = frontier.toSeq
          .flatMap { case (u, s) =>
            adj.getOrElse(u, Set.empty).map(_ -> s) }
          .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
          .filterNot { case (v, _) => state.contains(v) }
        d += 1
        state = state ++ contrib.map { case (v, s) => v -> ((d, s)) }
        frontier = contrib
      }
      state
    }
    val want = Seq(0L, 5L).flatMap(s =>
      ref(s, 4).map { case (v, (h, sg)) => (s, v, h, sg) }).toSet
    val gotR = Bfs.pathCounts(edges.toDF("src", "dst"),
        Seq(0L, 5L).toDF("seed"), maxDepth = 4)
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(gotR === want)
  }
}
