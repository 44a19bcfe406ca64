package graft.bel

import graft.SparkSpec

class IncrementalCCSpec extends SparkSpec {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long)].collect().toMap

  test("fold merges components across the delta: bridge, extension, " +
    "new component, intra-component no-op") {
    val base = Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h"))
      .toDF("src", "dst")
    val idx = ConnectedComponents.run(base)
    val delta = Seq(
      ("b", "c"), // bridges {a,b} and {c,d}
      ("f", "x"), // extends {e,f} with a new node
      ("y", "z"), // entirely new component
      ("g", "h")) // intra-component duplicate: must change nothing
      .toDF("src", "dst")
    val got = labels(IncrementalCC.fold(idx, delta))
    val want = labels(ConnectedComponents.run(base.unionByName(delta)))
    assert(got === want) // bit-identical labels, not just same partition
    assert(got.keySet === Set("a", "b", "c", "d", "e", "f", "g", "h",
      "x", "y", "z"))
    assert((got("a") === got("d")) && (got("e") === got("x")))
    assert((got("y") === got("z")) && (got("y") !== got("a")))
    assert(got("g") !== got("a"))
  }

  test("randomized folds are bit-identical to from-scratch runs and " +
    "compose across batches") {
    val rnd = new scala.util.Random(31)
    def edge() = (s"n${rnd.nextInt(60)}", s"n${rnd.nextInt(60)}")
    val base = Seq.fill(50)(edge()).toDF("src", "dst")
    val d1 = Seq.fill(25)(edge()).toDF("src", "dst")
    val d2 = Seq.fill(25)(edge()).toDF("src", "dst")
    val afterD1 = IncrementalCC.fold(ConnectedComponents.run(base), d1)
    assert(labels(afterD1) ===
      labels(ConnectedComponents.run(base.unionByName(d1))))
    // composition: folding d2 into the ALREADY-FOLDED index
    val afterD2 = IncrementalCC.fold(afterD1, d2)
    assert(labels(afterD2) === labels(
      ConnectedComponents.run(base.unionByName(d1).unionByName(d2))))
  }

  test("a delta self-loop on a first-seen node yields a singleton " +
    "(run() parity)") {
    val idx = ConnectedComponents.run(Seq(("a", "b")).toDF("src", "dst"))
    val got = labels(IncrementalCC.fold(idx,
      Seq(("q", "q")).toDF("src", "dst")))
    assert(got.keySet === Set("a", "b", "q"))
    assert(got("q") !== got("a"))
  }
}
