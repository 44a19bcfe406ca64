package graft.bel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModularitySpec extends SparkSpec {
  import spark.implicits._

  test("two cliques with one bridge: Q matches the closed-form driver " +
    "reference and is high; the everything-in-one-community labeling " +
    "scores 0") {
    def clique(p: String, n: Int) = for {
      i <- 0 until n; j <- i + 1 until n
    } yield (s"$p$i", s"$p$j")
    val edges = (clique("a", 4) ++ clique("b", 4) :+ ("a0" -> "b0"))
      .toDF("src", "dst")
    val labels = (0 until 4).flatMap(i =>
      Seq((s"a$i", "A"), (s"b$i", "B"))).toDF("node", "label")
    val got = Modularity.perCommunity(edges, labels)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // m = 13 (6 + 6 + bridge); per clique: l_c = 6; a0/b0 have deg 4
    val m = 13.0
    for (c <- Seq("A", "B")) {
      val (_, n, lc, dc, qc) = got(c)
      assert(n === 4L)
      assert(lc === 6.0)
      assert(dc === 13.0) // 3+3+3+4
      assert(math.abs(qc - (6.0 / m - math.pow(13.0 / (2 * m), 2)))
        < 1e-15)
    }
    val q = got.values.map(_._5).sum
    assert(q > 0.2, s"clique split must score high, got $q")
    // degenerate labeling: one community holding everything scores 0
    val one = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().withColumn("label", org.apache.spark.sql.functions.lit("X"))
    val q1 = Modularity.perCommunity(edges, one)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(_._5).sum
    assert(math.abs(q1) < 1e-15, s"single community must score 0, got $q1")
  }

  test("LPA labels on the clique pair score higher than a random split") {
    def clique(p: String, n: Int) = for {
      i <- 0 until n; j <- i + 1 until n
    } yield (s"$p$i", s"$p$j")
    val edges = (clique("a", 5) ++ clique("b", 5) :+ ("a0" -> "b0"))
      .toDF("src", "dst")
    val lpa = LabelPropagation.run(edges, 5)
    val qLpa = Modularity.perCommunity(edges, lpa)
      .as[(String, Long, Double, Double, Double)].collect().map(_._5).sum
    // adversarial split: alternate nodes across communities
    val bad = (0 until 5).flatMap(i => Seq(
      (s"a$i", if (i % 2 == 0) "X" else "Y"),
      (s"b$i", if (i % 2 == 0) "Y" else "X"))).toDF("node", "label")
    val qBad = Modularity.perCommunity(edges, bad)
      .as[(String, Long, Double, Double, Double)].collect().map(_._5).sum
    assert(qLpa > qBad + 0.2, s"LPA $qLpa vs random $qBad")
  }
}
