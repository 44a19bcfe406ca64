package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("jacobiEigen recovers a known 2x2 spectrum") {
    // [[2,1],[1,2]] → eigvals {3, 1}, eigvecs (1,1)/√2 and (1,−1)/√2
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(approx(sorted(0), 1.0) && approx(sorted(1), 3.0))
    // columns are orthonormal
    val dot01 = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot01) < 1e-10)
  }

  test("jacobiEigen on an already-diagonal matrix is the identity") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(5.0, 0.0, 0.0), Array(0.0, 2.0, 0.0),
        Array(0.0, 0.0, 7.0)))
    assert(vals.toSeq == Seq(5.0, 2.0, 7.0))
    for (i <- 0 until 3; j <- 0 until 3)
      assert(vecs(i)(j) == (if (i == j) 1.0 else 0.0))
  }

  private val line = {
    // points along (3,4)/5 with a small orthogonal wobble: the top
    // component must be the line direction
    val pts = (0 until 40).map { i =>
      val tLine = (i - 20).toDouble
      val wob = 0.01 * math.sin(i * 2.7)
      (i.toLong, Seq(0.6 * tLine - 0.8 * wob, 0.8 * tLine + 0.6 * wob))
    }
    pts.toDF("vec_id", "embedding")
  }

  test("fit finds the dominant axis, orthonormal, descending, sign-pinned") {
    val m = Pca.fit(line)
    assert(m.dim == 2)
    assert(m.eigvals(0) > m.eigvals(1) && m.eigvals(1) >= 0)
    // top axis ∝ (0.6, 0.8); sign convention: largest-|entry| positive
    assert(approx(math.abs(m.components(0)(0)), 0.6, 1e-3))
    assert(approx(math.abs(m.components(0)(1)), 0.8, 1e-3))
    assert(m.components(0)(1) > 0)
    val dot = m.components(0)(0) * m.components(1)(0) +
      m.components(0)(1) * m.components(1)(1)
    assert(math.abs(dot) < 1e-10)
  }

  test("covariance matches the brute-force population covariance") {
    val rows = line.select("embedding").as[Seq[Double]].collect()
    val n = rows.length
    val mu = Array.tabulate(2)(i => rows.map(_(i)).sum / n)
    val got = Pca.covariance(line).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    for (i <- 0 to 1; j <- i to 1) {
      val brute = rows.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n
      assert(approx(got((i, j)), brute, 1e-9), s"cov($i,$j)")
    }
  }

  test("gramExact equals brute-force quantized sums") {
    val got = Pca.gramExact(line, scale = 1000L).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val rows = line.select("embedding").as[Seq[Double]].collect()
      .map(_.map(x => math.floor(x * 1000).toLong))
    for (i <- 0 to 1; j <- i to 1) {
      val s = rows.map(v => v(i) * v(j)).sum
      assert(got((i, j)) == ((s, rows.length.toLong)), s"gram($i,$j)")
    }
  }

  test("duplicate row ids fail LOUDLY — they would cross-pair elements " +
    "of different rows through the self-join and corrupt every moment") {
    val dup = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)),
      (2L, Seq(5.0, 6.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception](Pca.gramExact(dup).collect())
    assert(e.getMessage.contains("duplicate id"), e.getMessage)
    // unique ids flow untouched through the guard
    val ok = Pca.gramExact(Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0)))
      .toDF("vec_id", "embedding")).collect()
    assert(ok.length == 3)
  }

  test("projected top-1 variance equals the top eigenvalue") {
    val m = Pca.fit(line)
    val proj = Pca.project(line, m, k = 1)
      .select(element_at(col("embedding"), 1).as("y"))
    val v = proj.agg(var_pop("y")).collect()(0).getDouble(0)
    assert(approx(v, m.eigvals(0), 1e-9))
  }

  test("whitened corpus has identity covariance") {
    val m = Pca.fit(line)
    val cov = Pca.covariance(Pca.whiten(line, m, k = 2)).collect()
    cov.foreach { r =>
      val expect = if (r.getInt(0) == r.getInt(1)) 1.0 else 0.0
      assert(math.abs(r.getDouble(2) - expect) < 1e-9,
        s"wcov(${r.getInt(0)},${r.getInt(1)})=${r.getDouble(2)}")
    }
  }

  test("degenerate axis whitens to zero, never NaN") {
    // second dimension constant → eigval 0 → whitened coord 0.0
    val flat = (0 until 10).map(i => (i.toLong, Seq(i.toDouble, 4.0)))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(flat)
    val w = Pca.whiten(flat, m, k = 2)
      .select(element_at(col("embedding"), 2)).as[Double].collect()
    assert(w.forall(_ == 0.0))
  }

  test("native projection is BIT-identical to the composed HOF form, " +
    "projected and whitened, float and double input") {
    val m = Pca.fit(line)
    val floatLine = line.select(col("vec_id"),
      transform(col("embedding"), _.cast("float")).as("embedding"))
    for {
      vecs <- Seq(line, floatLine)
      wh <- Seq(false, true)
      k <- Seq(1, 2)
    } {
      val native = Pca.projected(vecs, m, k, "vec_id", "embedding",
        whitened = wh).orderBy("vec_id")
        .select("embedding").as[Seq[Double]].collect()
      val hof = Pca.projectedComposed(vecs, m, k, "vec_id", "embedding",
        whitened = wh).orderBy("vec_id")
        .select("embedding").as[Seq[Double]].collect()
      assert(native.toSeq == hof.toSeq, s"wh=$wh k=$k")
    }
  }

  test("native projection: null vector or null element yields a NULL row") {
    val vecs = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)),
      (2L, null.asInstanceOf[Seq[java.lang.Double]]),
      (3L, Seq[java.lang.Double](1.0, null)))
      .toDF("vec_id", "embedding")
    val m = Pca.fit(vecs.filter(col("vec_id") === 1L)
      .unionByName(Seq((9L, Seq[java.lang.Double](3.0, 1.0)))
        .toDF("vec_id", "embedding")))
    val got = Pca.project(vecs, m, k = 2)
      .orderBy("vec_id").select("embedding").collect()
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("foldGram of disjoint halves equals the full gram bit-exactly") {
    val full = Pca.gramExact(line, scale = 1000L).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val folded = Pca.foldGram(
        Pca.gramExact(line.filter(col("vec_id") % 2 === 0), scale = 1000L),
        Pca.gramExact(line.filter(col("vec_id") % 2 === 1), scale = 1000L))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(folded == full)
  }

  test("k outside [1, dim] fails fast") {
    val m = Pca.fit(line)
    intercept[IllegalArgumentException](Pca.project(line, m, 0))
    intercept[IllegalArgumentException](Pca.project(line, m, 3))
  }

  test("fit on an empty corpus fails fast") {
    intercept[IllegalArgumentException](
      Pca.fit(line.filter(col("vec_id") < 0)))
  }
}
