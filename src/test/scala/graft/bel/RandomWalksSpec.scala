package graft.bel

import java.security.MessageDigest

import graft.SparkSpec

class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("walks match a driver-side replay of the hash-argmin rule") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 80).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2).distinct
    val adj = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct }
    val steps = 3
    // reference: per walker, per step, argmin (md5(w:t:v), v)
    def replay(w: Long): Seq[(Long, Int, Long)] = {
      var cur = w
      (0 to steps).flatMap { t =>
        if (t == 0) Some((w, 0, w))
        else adj.get(cur) match {
          case None => None
          case Some(ns) =>
            val pick = ns.minBy(v => (md5hex(s"$w:$t:$v"), v))
            cur = pick
            Some((w, t, pick))
        }
      }
    }
    val want = adj.keys.toSeq.flatMap(replay).toSet
    val got = RandomWalks.walks(edges.toDF("src", "dst"), steps)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("walks are partitioning-independent") {
    val edges = (1 to 30).map(i => (i.toLong % 7, (i * 3).toLong % 7))
      .filter(e => e._1 != e._2).distinct.toDF("src", "dst")
    val runs = Seq(1, 4).map { n =>
      RandomWalks.walks(edges.repartition(n), steps = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }
    assert(runs.head === runs.last)
  }

  test("skipGramPairs: banded positions only, counts aggregated") {
    val rows = Seq(
      (1L, 0, 10L), (1L, 1, 20L), (1L, 2, 10L), (1L, 3, 30L),
      (2L, 0, 10L), (2L, 1, 20L))
      .toDF("walk_id", "pos", "node")
    val got = RandomWalks.skipGramPairs(rows, window = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // walk 1 adjacent pairs: (10,20),(20,10),(20,10),(10,20),(10,30),(30,10)
    // walk 2: (10,20),(20,10)
    assert(got === Set(
      (10L, 20L, 3L), (20L, 10L, 3L), (10L, 30L, 1L), (30L, 10L, 1L)))
  }

  test("every undirected walk completes all steps") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = RandomWalks.walks(edges, steps = 5)
    assert(out.count() === 3 * 6) // 3 walkers x (steps + 1) positions
  }
}
