package graft.bel

import java.security.MessageDigest

import graft.SparkSpec

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def draw(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  test("negatives match a driver-side replay; no true triple survives") {
    val triples = Seq((1L, "rel", 10L), (1L, "rel", 11L), (2L, "rel", 10L))
    val entities = (10L to 29L).toSeq
    val k = 3
    val buckets = 4
    val entByBucket = entities.groupBy(e => draw(s"$e:negbucket") % buckets)
    val want = (for {
      (s, r, o) <- triples
      slot <- 0 until k
      b = draw(s"$s:$r:$o:$slot:negslot") % buckets
      cands = entByBucket.getOrElse(b, Seq.empty)
      if cands.nonEmpty
      neg = cands.minBy(e => (md5hex(s"$s:$r:$o:$slot:$e"), e))
      if !triples.contains((s, r, neg))
    } yield (s, r, o, slot, neg)).toSet
    val got = NegativeSampling.corruptObjects(
      triples.toDF("s", "r", "o"), entities.toDF("e"), k, buckets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4))).toSet
    assert(got === want)
    got.foreach { case (s, r, _, _, neg) =>
      assert(!triples.contains((s, r, neg)), "true triple leaked")
    }
  }

  test("sampling is reproducible across partitionings") {
    val triples = (1 to 50).map(i => (i.toLong % 9, "r", (i * 7).toLong % 30))
      .distinct.toDF("s", "r", "o")
    val entities = (0L to 49L).toDF("e")
    val runs = Seq(1, 8).map { n =>
      NegativeSampling.corruptObjects(
        triples.repartition(n), entities.repartition(n), 2, 8)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3),
          r.getLong(4))).toSet
    }
    assert(runs.head === runs.last)
  }
}
