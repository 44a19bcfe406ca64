package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[FuzzyJoin.fuzzyPairs]] against a brute-force reference: the blocked
  * join must return EXACTLY the pairs a full cross product + Levenshtein
  * would — completeness is the whole point of the partition-signature
  * scheme, so it is checked pair-for-pair, not statistically. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brutePairs(rows: Seq[(Long, String)],
                         d: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if sa.length < sb.length || (sa.length == sb.length && ia < ib)
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet

  private def got(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.fuzzyPairs(rows.toDF("id", "s"), "id", "s", d)
      .as[(Long, Long, Long)].collect().toSet

  private def check(rows: Seq[(Long, String)], d: Int): Unit = {
    val expected = brutePairs(rows, d)
    val actual = got(rows, d)
    assert(actual == expected,
      s"missing=${expected -- actual} spurious=${actual -- expected}")
  }

  test("random short strings over a tiny alphabet: exact pair parity " +
    "(exercises the short bucket, the main path, and their boundary)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val rows = (0L until 60L).map { i =>
        val len = rnd.nextInt(11) // 0..10 spans short (<=4) and main paths
        (trial * 100L + i,
          (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      }
      check(rows, d = 2)
    }
  }

  test("planted single-char edits on realistic names are all recovered") {
    val names = Seq("goldenrod lavender spring chocolate lace",
      "maroon cyan navy powder burlywood", "deep puff dim honeydew royal",
      "goldenrod lavender spring chocolate mace")
    val rows = names.zipWithIndex.flatMap { case (s, i) =>
      val del = s.substring(0, 3 + i) + s.substring(4 + i)     // 1 deletion
      val sub = s.updated(6, 'Q')                              // 1 substitution
      Seq((i * 10L, s), (i * 10L + 1, del), (i * 10L + 2, sub))
    }
    check(rows, d = 2)
  }

  test("maxDist 1 and 3 agree with brute force on mixed-length data") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 50L).map { i =>
      val len = rnd.nextInt(15)
      (i, (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    }
    check(rows, d = 1)
    check(rows, d = 3)
  }

  test("null strings never pair; duplicate strings are distance-0 pairs") {
    val df = Seq((1L, "abcdefgh"), (2L, "abcdefgh"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val out = FuzzyJoin.fuzzyPairs(df, "id", "s", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 0L)))
  }

  test("plan shape: candidate generation is an equi-join, never a " +
    "nested-loop product") {
    val df = (0L until 40L).map(i => (i, s"prefix$i suffix")).toDF("id", "s")
    val plan = FuzzyJoin.fuzzyPairs(df, "id", "s", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the short bucket's theta-join is the only BNLJ allowed, and on this
    // data (all strings length > 4) its input is empty
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
  }
}
