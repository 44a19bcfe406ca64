package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CentroidClassifySpec extends SparkSpec {
  import spark.implicits._

  test("well-separated classes classify back to their own centroid") {
    val vecs = (0 until 40).map { i =>
      val cls = i % 2
      val base = if (cls == 0) 1.0 else -1.0
      (i.toLong, cls, Seq(base + 0.01 * (i % 5), base - 0.01 * (i % 3)))
    }.toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidClassify(vecs)
      .select("vec_id", "label", "label_pred")
      .as[(Long, Int, Int)].collect()
    assert(got.length == 40)
    assert(got.forall(r => r._2 == r._3))
  }

  test("a midpoint vector ties and breaks to the SMALLER label") {
    // two singleton classes at ±1; probe sits exactly between
    val vecs = Seq(
      (1L, 7, Seq(1.0)), (2L, 3, Seq(-1.0)), (3L, 7, Seq(0.0)))
      .toDF("vec_id", "label", "embedding")
    // classes: 7 → centroid from vecs 1 and 3 = 0.5; 3 → −1.0.
    // vec 3 at 0.0: dist to c7 = 0.5, to c3 = 1.0 → label 7.
    // vec 2 at −1: dist to c3 = 0 → label 3. vec 1 at 1: c7 wins.
    val got = Similarity.centroidClassify(vecs)
      .select("vec_id", "label_pred").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 7, 2L -> 3, 3L -> 7))
    // exact tie: singleton classes at ±1, probe class made equidistant
    val tied = Seq((1L, 9, Seq(1.0)), (2L, 4, Seq(-1.0)))
      .toDF("vec_id", "label", "embedding")
    val t = Similarity.centroidClassify(tied)
      .select("vec_id", "label_pred").as[(Long, Int)].collect().toMap
    // each vector is distance 0 to its own class — sanity
    assert(t == Map(1L -> 9, 2L -> 4))
  }

  test("assignment is NARROW: centroids ride as literals, no join or " +
    "shuffle in the emitted frame") {
    val p = tmpDir("cc_vecs") + "/v"
    (0 until 64).map(i => (i.toLong, i % 3, Seq(i * 0.1, 1.0 - i * 0.05)))
      .toDF("vec_id", "label", "embedding").write.parquet(p)
    val vecs = spark.read.parquet(p)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Similarity.centroidClassify(vecs)
      out.collect()
      val plan = out.queryExecution.executedPlan
      assert(plan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e }.isEmpty,
        s"classification emitted a shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("equiWidthHistogram: exact counts, negatives floor DOWN, " +
    "bad width rejected") {
    val df = Seq(("a", 0.0), ("a", 24.9), ("a", 25.0), ("a", -0.1),
      ("b", 50.0)).toDF("k", "v")
    val got = Profile.equiWidthHistogram(df, "k", "v", 25.0)
      .select("k", "bin", "bin_lo", "cnt")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(got == Set(("a", 0L, 0.0, 2L), ("a", 1L, 25.0, 1L),
      ("a", -1L, -25.0, 1L), ("b", 2L, 50.0, 1L)))
    intercept[IllegalArgumentException](
      Profile.equiWidthHistogram(df, "k", "v", 0.0))
  }

  test("mutualTopOne: reciprocal pairs only, each emitted once a < b") {
    // unit-ish 2-d vectors at angles 0°, 10°, 30°: NN(a)=b and NN(b)=a
    // (mutual); NN(c)=b but NN(b)=a, so c pairs with nobody
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)),
      math.sin(math.toRadians(deg)))
    val vecs = Seq((1L, at(0)), (2L, at(10)), (3L, at(30)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mutualTopOne(vecs)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("mutualTopOne on twins recovers every planted pair exactly") {
    val base = (0 until 30).map(i =>
      (i.toLong, Seq(math.cos(i * 0.7), math.sin(i * 0.7), i * 0.01)))
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.map(_ + 0.0001)) }
    val vecs = (base ++ twins).toDF("vec_id", "embedding")
    val got = Similarity.mutualTopOne(vecs)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got == base.map(b => (b._1, b._1 + 1000L)).toSet)
  }

  test("empty corpus fails fast") {
    val vecs = Seq((1L, 1, Seq(1.0))).toDF("vec_id", "label", "embedding")
    intercept[IllegalArgumentException](
      Similarity.centroidClassify(vecs.filter(col("vec_id") < 0)))
  }

  test("native kernel is BIT-identical to the HOF form it replaced — " +
    "random corpus, ragged label sizes, double AND float elements") {
    val rnd = new scala.util.Random(1217)
    val d = 24
    // 7 labels with uneven counts incl. negative values and near-tie
    // clusters — the argmin must agree on every row, not just easy ones
    val rows = (0 until 300).map { i =>
      val lab = rnd.nextInt(7) * 3 // labels 0,3,..,18 (non-contiguous)
      (i.toLong, lab,
        Seq.tabulate(d)(j => (rnd.nextDouble() - 0.5) * 4 +
          0.3 * lab * math.sin(j)))
    }
    val asDouble = rows.toDF("vec_id", "label", "embedding")
    val asFloat = rows.map { case (id, l, v) => (id, l, v.map(_.toFloat)) }
      .toDF("vec_id", "label", "embedding")
    for (vecs <- Seq(asDouble, asFloat)) {
      val native = Similarity.centroidClassify(vecs)
        .select("vec_id", "label_pred").as[(Long, Int)].collect().toMap
      val hof = Similarity.centroidClassifyHof(vecs)
        .select("vec_id", "label_pred").as[(Long, Int)].collect().toMap
      assert(native == hof)
      assert(native.size == 300)
    }
  }

  test("native kernel: null vector yields a NULL prediction") {
    val vecs = Seq((1L, 0, Some(Seq(1.0, 2.0))), (2L, 1, None),
      (3L, 1, Some(Seq(-1.0, 0.0))))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidClassify(vecs)
      .select("vec_id", "label_pred").as[(Long, Option[Int])]
      .collect().toMap
    assert(got(1L).isDefined && got(3L).isDefined && got(2L).isEmpty)
  }
}
