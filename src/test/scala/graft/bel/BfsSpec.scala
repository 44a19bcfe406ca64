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
