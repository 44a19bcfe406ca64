package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property coverage for the FULL as-of mode matrix
  * (backward/forward × strict × tolerance, plus nearest) against a
  * brute-force reference over generated corpora — the modes compose, and
  * a mode pair that each pass alone can still disagree where their
  * interactions meet (strict + tolerance at an exact-tie boundary, say);
  * random corpora with heavy timestamp collisions probe exactly those
  * seams. */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample loop standing in for forAll — the CuriesSpec
    * convention (seeded, reproducible, no flaky shrinking). */
  private def forAllSeeded[A](g: Gen[A], n: Int = 12)(f: A => Unit): Unit =
    (0 until n).foreach(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f))

  // small key/ts domains force collisions: equal-ts ties, same-key
  // pile-ups, keys with no right rows
  private val corpusGen = for {
    nl <- Gen.choose(5, 40)
    nr <- Gen.choose(0, 40)
    ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L)))
    rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L)))
  } yield (ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
    // one right row per (k, ts): the deterministic-tie contract the
    // registered gates also pre-aggregate to
    rs.distinctBy(r => (r._1, r._2)).map { case (k, t) => (k, t, k + t) })

  private def reference(ls: Seq[(Long, Long, Long)],
                        rs: Seq[(Long, Long, Long)],
                        forward: Boolean, strict: Boolean,
                        tol: Option[Long]): Map[Long, Option[Long]] = {
    val byKey = rs.groupBy(_._1)
    ls.map { case (k, t, id) =>
      val cands = byKey.getOrElse(k, Seq.empty).filter { case (_, rt, _) =>
        val dirOk =
          if (forward) { if (strict) rt > t else rt >= t }
          else { if (strict) rt < t else rt <= t }
        val tolOk = tol.forall(x =>
          if (forward) rt <= t + x else rt >= t - x)
        dirOk && tolOk
      }
      val pick =
        if (cands.isEmpty) None
        else Some(if (forward) cands.minBy(_._2)._2 else cands.maxBy(_._2)._2)
      id -> pick
    }.toMap
  }

  test("mode matrix agrees with brute force on collision-heavy corpora") {
    forAllSeeded(corpusGen) { case (ls, rs) =>
      val l = ls.toDF("k", "ts", "lid")
      val r = rs.toDF("k", "ts", "payload")
      for {
        forward <- Seq(false, true)
        strict <- Seq(false, true)
        tol <- Seq(None, Some(3L))
      } {
        val got = Temporal.asOfJoin(l, r, Seq("k"), rightPrefix = "q_",
          tolerance = tol, forward = forward, strict = strict)
          .select("lid", "q_ts").collect()
          .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
            else Some(x.getLong(1)))).toMap
        val want = reference(ls, rs, forward, strict, tol)
        assert(got === want,
          s"forward=$forward strict=$strict tol=$tol\nL=$ls\nR=$rs")
      }
    }
  }

  test("nearest equals the closer of backward/forward, backward on ties") {
    forAllSeeded(corpusGen) { case (ls, rs) =>
      val l = ls.toDF("k", "ts", "lid")
      val r = rs.toDF("k", "ts", "payload")
      val back = reference(ls, rs, forward = false, strict = false, None)
      val fwd = reference(ls, rs, forward = true, strict = false, None)
      val want = ls.map { case (_, t, id) =>
        id -> ((back(id), fwd(id)) match {
          case (None, f) => f
          case (b, None) => b
          case (Some(b), Some(f)) =>
            if (f - t < t - b) Some(f) else Some(b)
        })
      }.toMap
      val got = Temporal.asOfJoinNearest(l, r, Seq("k"),
        rightPrefix = "q_")
        .select("lid", "q_ts").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
          else Some(x.getLong(1)))).toMap
      assert(got === want, s"L=$ls\nR=$rs")
    }
  }
}
