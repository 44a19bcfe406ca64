package graft.bel

import graft.SparkSpec

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
}
