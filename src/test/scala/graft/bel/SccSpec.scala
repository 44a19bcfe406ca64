package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

class SccSpec extends SparkSpec {
  import spark.implicits._

  private def edgesOf(pairs: (String, String)*): DataFrame =
    pairs.toDF("src", "dst")

  /** component-label → member-set map, labels canonicalized to the
    * min member (internal labels are hashes). */
  private def groupsOf(df: DataFrame): Set[Set[String]] =
    df.as[(String, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("two cycles bridged one-way stay SEPARATE components " +
    "(the undirected CC over-merge this operator exists to avoid)") {
    val got = groupsOf(Scc.run(edgesOf(
      ("a", "b"), ("b", "c"), ("c", "a"), // cycle 1
      ("c", "x"),                         // one-way bridge
      ("x", "y"), ("y", "x"))))           // cycle 2
    assert(got == Set(Set("a", "b", "c"), Set("x", "y")))
  }

  test("a DAG is all singletons") {
    val got = groupsOf(Scc.run(edgesOf(
      ("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))))
    assert(got == Set(Set("a"), Set("b"), Set("c"), Set("d")))
  }

  test("direction matters: a→b alone does not merge; adding b→a does") {
    assert(groupsOf(Scc.run(edgesOf(("a", "b")))) ==
      Set(Set("a"), Set("b")))
    assert(groupsOf(Scc.run(edgesOf(("a", "b"), ("b", "a")))) ==
      Set(Set("a", "b")))
  }

  test("nested structure: SCC chain peels across outer rounds") {
    // three 2-cycles in a directed chain: c1 → c2 → c3; min-label
    // peeling assigns some per round, the rest in later rounds
    val got = groupsOf(Scc.run(edgesOf(
      ("a", "b"), ("b", "a"),
      ("b", "c"),
      ("c", "d"), ("d", "c"),
      ("d", "e"),
      ("e", "f"), ("f", "e"))))
    assert(got == Set(Set("a", "b"), Set("c", "d"), Set("e", "f")))
  }

  test("self-loops and null endpoints are dropped on values") {
    val edges = Seq((Some("a"), Some("a")), (Some("a"), Some("b")),
      (Some("b"), Some("a")), (None, Some("b")), (Some("b"), None))
      .toDF("src", "dst")
    assert(groupsOf(Scc.run(edges)) == Set(Set("a", "b")))
  }

  test("matches a brute-force transitive-closure SCC on a random digraph") {
    val rnd = new scala.util.Random(1201)
    val pairs = (0 until 60).map(_ =>
      (s"n${rnd.nextInt(14)}", s"n${rnd.nextInt(14)}"))
      .filter(p => p._1 != p._2).distinct
    // brute: Floyd–Warshall reachability, SCC = mutual reach
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val reach = Array.fill(n, n)(false)
    pairs.foreach(p => reach(idx(p._1))(idx(p._2)) = true)
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val brute = nodes.indices.map { i =>
      nodes.indices.filter(j =>
        i == j || (reach(i)(j) && reach(j)(i))).map(nodes).toSet
    }.toSet
    assert(groupsOf(Scc.run(pairs.toDF("src", "dst"))) == brute)
  }

  test("every in-loop exchange hashes on long keys (the dict-encode pin)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Scc.run(edgesOf(("a", "b"), ("b", "a"), ("b", "c"),
        ("c", "d"), ("d", "c")))
      // the rim decode join carries values by design; everything before
      // it ran during Scc.run's internal actions — re-run one inner
      // fixpoint shape and inspect it directly instead
      val adj = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("u", "v")
      val lab = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("node", "lab")
      val step = lab.unionByName(
          lab.join(adj, lab("node") === adj("u"))
            .select(col("v").as("node"), col("lab")))
        .groupBy("node").agg(min("lab").as("lab"))
      step.collect()
      val shuffles = step.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty)
      shuffles.foreach(_.outputPartitioning match {
        case h: HashPartitioning =>
          assert(h.expressions.forall(_.dataType == LongType))
        case other => fail(s"unexpected partitioning $other")
      })
      assert(out.columns.toSeq == Seq("node", "component"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("condensation: quotient edges between distinct SCCs, acyclic, " +
    "within-SCC edges dropped; precomputed labels flow verbatim") {
    val ed = edgesOf(
      ("a", "b"), ("b", "a"), // SCC {a,b}
      ("b", "c"),
      ("c", "d"), ("d", "c"), // SCC {c,d}
      ("d", "e"))             // singleton e
    val scc = Scc.run(ed)
    val canon = scc.groupBy("component")
      .agg(min("node").as("m"))
    val labeled = scc.join(canon, "component")
      .select(col("node"), col("m").as("component"))
    val q = Scc.condensation(ed, labels = Some(labeled))
      .as[(String, String)].collect().toSet
    assert(q == Set(("a", "c"), ("c", "e")))
    // acyclicity: mutual quotient edges would mean a missed merge
    assert(q.forall { case (x, y) => !q.contains((y, x)) })
    // and the self-running face agrees modulo internal label values
    assert(Scc.condensation(ed).count() == 2)
  }

  test("trim: a 1000-node shallow tendril fringe off one cycle peels in " +
    "TWO outer rounds (trim + one FW-BW for the cycle)") {
    // 100 tendril chains of depth 10 feeding a 4-cycle — the web-graph
    // fringe shape the Slota trim exists for. maxOuter = 2 pins that
    // the whole fringe fell to trim, not to FW-BW peeling rounds.
    val cycle = Seq(("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c0"))
    val tendrils = for {
      c <- 0 until 100
      d <- 0 until 10
    } yield {
      val from = f"t$c%03d_$d%02d"
      val to = if (d == 9) "c0" else f"t$c%03d_${d + 1}%02d"
      (from, to)
    }
    val got = groupsOf(Scc.run((cycle ++ tendrils).toDF("src", "dst"),
      maxOuter = 2))
    assert(got.contains(Set("c0", "c1", "c2", "c3")))
    assert(got.size == 1001) // 1000 tendril singletons + the cycle
  }

  test("trim rescues a chain whose diameter exceeds maxInner — the case " +
    "FW-BW alone deterministically require-fails") {
    // a 240-node directed chain: min-label propagation needs ~239
    // one-hop rounds, far past maxInner = 100, so pre-trim this graph
    // CANNOT finish regardless of maxOuter; trim dissolves it without
    // running a single fixpoint (maxOuter = 1 pins that)
    val chain = (0 until 239).map(i => (f"n$i%03d", f"n${i + 1}%03d"))
    val got = groupsOf(Scc.run(chain.toDF("src", "dst"),
      maxOuter = 1, maxInner = 100))
    assert(got.size == 240 && got.forall(_.size == 1))
    // and a capped-out trim is SAFE, not wrong: with maxTrim too small
    // for the depth the residue falls through to FW-BW — here the
    // remaining sub-chain is short enough for the fixpoints to finish
    val short = (0 until 30).map(i => (f"m$i%02d", f"m${i + 1}%02d"))
    val got2 = groupsOf(Scc.run(short.toDF("src", "dst"),
      maxOuter = 50, maxInner = 100, maxTrim = 3))
    assert(got2.size == 31 && got2.forall(_.size == 1))
  }

  test("topoLevels: longest-path waves on a diamond; cycle fails fast " +
    "with a diagnosis; matches brute longest path on a random DAG") {
    // diamond with a long arm: a→b→c→d plus a→d; d's level is 3, not 1
    val lv = Scc.topoLevels(edgesOf(("a", "b"), ("b", "c"), ("c", "d"),
      ("a", "d")))
      .as[(String, Long)].collect().toMap
    assert(lv == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    // a cycle diverges — the require names the cause
    val ex = intercept[IllegalArgumentException](
      Scc.topoLevels(edgesOf(("x", "y"), ("y", "x")), maxRounds = 10))
    assert(ex.getMessage.contains("cycle"))
    // maxRounds bounds DEPTH: a chain of depth EXACTLY maxRounds
    // converges (depth relax rounds + the observe round fit the loop)
    val chain = (0 until 5).map(i => (f"c$i%d", f"c${i + 1}%d"))
    val atCap = Scc.topoLevels(chain.toDF("src", "dst"), maxRounds = 5)
      .as[(String, Long)].collect().toMap
    assert(atCap == (0 to 5).map(i => f"c$i%d" -> i.toLong).toMap)
    // random DAG (edges only i → j for i < j): brute longest path
    val rnd = new scala.util.Random(1307)
    val es = (0 until 120).map { _ =>
      val i = rnd.nextInt(13); val j = math.min(13, i + 1 + rnd.nextInt(5))
      (f"n$i%02d", f"n$j%02d")
    }.filter(p => p._1 != p._2).distinct
    val got = Scc.topoLevels(es.toDF("src", "dst"))
      .as[(String, Long)].collect().toMap
    val nodes = es.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val brute = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
    var changed = true
    while (changed) {
      changed = false
      es.foreach { case (u, v) =>
        if (brute(u) + 1 > brute(v)) { brute(v) = brute(u) + 1; changed = true }
      }
    }
    assert(got == brute.toMap)
  }

  test("edgeless input returns an empty frame; bad params fail fast") {
    val empty = Scc.run(edgesOf())
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("node", "component"))
    intercept[IllegalArgumentException](
      Scc.run(edgesOf(("a", "b")), maxOuter = 0))
    intercept[IllegalArgumentException](
      Scc.run(Seq((1, "x")).toDF("src", "dst")))
  }
}
