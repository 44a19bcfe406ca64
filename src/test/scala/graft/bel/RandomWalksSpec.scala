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

  test("neighborFanout: bounded per-parent samples matching the " +
    "md5-order reference, identical across seeds and partitionings") {
    val rnd = new scala.util.Random(59)
    val n = 25
    val edges = (1 to 80).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val adj = (edges ++ edges.map(_.swap)).distinct.groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val fanouts = Seq(3, 2)
    // driver reference: per hop, each frontier node keeps the k
    // neighbors with smallest (md5("u:hop:v"), v)
    def ref(seed: Long): Set[(Long, Int, Long, Long)] = {
      var frontier = Set(seed)
      var out = Set.empty[(Long, Int, Long, Long)]
      for ((k, i) <- fanouts.zipWithIndex) {
        val hop = i + 1
        val picked = frontier.flatMap { u =>
          adj.getOrElse(u, Set.empty).toSeq
            .sortBy(v => (md5hex(s"$u:$hop:$v"), v)).take(k)
            .map(v => (seed, hop, u, v))
        }
        out = out ++ picked
        frontier = picked.map(_._4)
      }
      out
    }
    val seeds = Seq(0L, 4L)
    val want = seeds.flatMap(ref).toSet
    val got = RandomWalks.neighborFanout(
        edges.toDF("src", "dst").repartition(7), seeds.toDF("seed"),
        fanouts)
      .as[(Long, Int, Long, Long)].collect()
    assert(got.toSet === want)
    assert(got.length === got.toSet.size, "no duplicate sampled edges")
    // per-(seed, hop, parent) bound holds
    got.groupBy(t => (t._1, t._2, t._3)).foreach { case ((_, h, _), es) =>
      assert(es.length <= fanouts(h - 1))
    }
    // overlapping neighborhoods sample IDENTICAL edges across seeds
    val byParent = got.groupBy(t => (t._2, t._3))
      .map { case (k, es) => k -> es.groupBy(_._1)
        .values.map(_.map(e => (e._3, e._4)).toSet).toSet }
    byParent.values.foreach(sets => assert(sets.size === 1,
      "the per-parent draw must not depend on the seed"))
  }
}
