package graft.bel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssortativitySpec extends SparkSpec {
  import spark.implicits._

  private def run(pairs: (String, String)*) =
    Assortativity.degreeAssortativity(pairs.toDF("src", "dst"))
      .collect().head

  test("a star is perfectly disassortative: r = -1") {
    val r = run(("hub", "a"), ("hub", "b"), ("hub", "c"))
    assert(r.getLong(0) == 6L) // 3 undirected edges → 6 directed pairs
    assert(r.getDouble(4) == -1.0)
  }

  test("a degree-regular graph has undefined r (NULL, never an error)") {
    // triangle: every node degree 2 → zero degree variance
    val r = run(("a", "b"), ("b", "c"), ("a", "c"))
    assert(r.isNullAt(4))
    assert(r.getLong(0) == 6L && r.getLong(1) == 12L)
  }

  test("self-loops and duplicate/reversed edges are cleaned first") {
    val r = run(("hub", "a"), ("a", "hub"), ("hub", "hub"),
      ("hub", "b"), ("hub", "c"))
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(4) == -1.0)
  }

  test("matches the brute-force Pearson formula on a random graph") {
    val rnd = new scala.util.Random(59)
    val pairs = (0 until 150).map { _ =>
      (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}")
    }.filter(p => p._1 != p._2).distinct
    val got = Assortativity.degreeAssortativity(
      pairs.toDF("src", "dst")).collect().head
    val und = pairs.map(p =>
      (Seq(p._1, p._2).min, Seq(p._1, p._2).max)).toSet
    val dirs = und.toSeq.flatMap(e => Seq(e, (e._2, e._1)))
    val deg = dirs.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
    val xs = dirs.map(d => (deg(d._1), deg(d._2)))
    val m = xs.size.toLong
    val sx = xs.map(_._1).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) == ((m, sx, sxy, sxx)))
    val expect = (m * sxy - sx * sx).toDouble / (m * sxx - sx * sx).toDouble
    assert(got.getDouble(4) == expect)
  }
}
