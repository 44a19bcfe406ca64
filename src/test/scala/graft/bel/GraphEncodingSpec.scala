package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec
import graft.core.Checkpoints

/** Pins the dict-encode posture of the iterative graph loops: after the
  * one-time entry encode, every exchange a loop round plans must hash
  * on LONG keys — raw node/label values never shuffle round after
  * round. (PageRank pins its own loop in PageRankSpec; these cover the
  * LPA step and the shared BFS relaxation.) */
class GraphEncodingSpec extends SparkSpec {
  import spark.implicits._

  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Every shuffle in `df`'s executed plan must hash-partition on
    * long-typed expressions (broadcast exchanges are exempt — a small
    * side broadcasting is fine; what must never happen is a hash
    * exchange keyed on values). */
  private def assertLongKeyedShuffles(df: DataFrame): Unit = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.nonEmpty, s"expected at least one exchange:\n$plan")
    shuffles.foreach { e =>
      e.outputPartitioning match {
        case h: HashPartitioning =>
          assert(h.expressions.forall(_.dataType == LongType),
            s"in-loop exchange hashes a non-long key " +
              s"(${h.expressions.map(_.dataType)}):\n$plan")
        case other =>
          fail(s"unexpected in-loop partitioning $other:\n$plan")
      }
    }
  }

  test("orderedIds: ids strictly ascend in node order — min(id) picks " +
    "the same element as min(node)") {
    val got = LabelPropagation.orderedIds(
        Seq("d", "a", "c", "b", "e").toDF("node"))
      .as[(String, Long)].collect().sortBy(_._2)
    assert(got.map(_._1).toSeq === Seq("a", "b", "c", "d", "e"))
    assert(got.map(_._2).toSeq.sliding(2).forall(p => p(0) < p(1)))
  }

  test("LPA step: every in-loop exchange hashes on long keys") {
    withoutAqe {
      val und = LabelPropagation.undirectedSimple(
        Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
          .toDF("src", "dst"))
      val dict = Checkpoints.cut(LabelPropagation.orderedIds(
        und.select(col("u").as("node")).distinct()))
      val e = Checkpoints.cut(und
        .join(dict.select(col("node").as("u"), col("id").as("__u")),
          Seq("u"))
        .join(dict.select(col("node").as("v"), col("id").as("__v")),
          Seq("v"))
        .select(col("__u").as("u"), col("__v").as("v")))
      val labels = Checkpoints.cut(
        dict.select(col("id").as("node"), col("id").as("label")))
      assertLongKeyedShuffles(LabelPropagation.step(e, labels))
    }
  }

  test("BFS relaxation round: every in-loop exchange hashes on long " +
    "keys, on both the folded and the per-seed state") {
    withoutAqe {
      val adj = Checkpoints.cut(
        Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
          .toDF("nu", "nv")
          .select(xxhash64(col("nu")).as("u"), xxhash64(col("nv")).as("v")))
      val dist = Checkpoints.cut(Seq("a").toDF("nv")
        .select(xxhash64(col("nv")).as("node"), lit(0).as("hops")))
      assertLongKeyedShuffles(Bfs.relaxOnce(adj, dist, Seq("node")))
      val perSeed = Checkpoints.cut(Seq("a").toDF("nv")
        .select(xxhash64(col("nv")).as("seed"))
        .select(col("seed"), col("seed").as("node"), lit(0).as("hops")))
      assertLongKeyedShuffles(
        Bfs.relaxOnce(adj, perSeed, Seq("seed", "node")))
    }
  }

  test("k-truss peel round: every in-loop exchange hashes on long keys") {
    withoutAqe {
      val oriented = Checkpoints.cut(
        Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
          .toDF("nu", "nv")
          .select(xxhash64(col("nu")).as("x"), xxhash64(col("nv")).as("y"))
          .withColumn("ykey",
            struct(lit(2L).as("d"), col("y").as("n"))))
      assertLongKeyedShuffles(KTruss.peelOnce(oriented, k = 3))
    }
  }

  test("LPA run end-to-end still labels on VALUES: encode maps back at " +
    "the rim and ties break on the VALUE order, not the id hash") {
    // star around "m" plus the isolated pair (x, y): every leaf adopts
    // label "m"? No — synchronous round 1: m sees leaves {a, b, z},
    // tie → smallest VALUE "a"; leaves see only m. A hash encode
    // breaking ties on ids would pick whichever value hashes lowest.
    val edges = Seq(("m", "a"), ("m", "b"), ("m", "z"), ("x", "y"))
      .toDF("src", "dst")
    val got = LabelPropagation.run(edges, iterations = 1)
      .as[(String, String)].collect().toMap
    assert(got("m") === "a", "tie must break on smallest label VALUE")
    assert(got("a") === "m" && got("b") === "m" && got("z") === "m")
    assert(got("x") === "y" && got("y") === "x")
  }
}
