package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native hyperplane-band kernel must be bit-indistinguishable from
  * the `functions`-composed reference family (same xxhash64(plane, dim)
  * sign lattice) — candidate generation in lshTopK / embeddingPairs
  * depends on the band values exactly. */
class HyperplaneBandsSpec extends SparkSpec {
  import spark.implicits._

  test("native == composed on random float vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(24)(rnd.nextGaussian().toFloat))
    }.toDF("id", "v")
    val both = vecs.select(
      Vectors.hyperplaneBands(col("v"), 8, 8).as("native"),
      Vectors.hyperplaneBandsComposed(col("v"), 8, 8).as("composed"))
    assert(both.collect().forall { r =>
      r.getSeq[Long](0) == r.getSeq[Long](1)
    })
  }

  test("native == composed on double vectors and varying dims") {
    val rnd = new scala.util.Random(11)
    // mixed dims in one column exercise the kernel's sign-table growth
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.fill(8 + (i % 3) * 8)(rnd.nextGaussian()))
    }.toDF("id", "v")
    val both = vecs.select(
      Vectors.hyperplaneBands(col("v"), 4, 12).as("native"),
      Vectors.hyperplaneBandsComposed(col("v"), 4, 12).as("composed"))
    assert(both.collect().forall { r =>
      r.getSeq[Long](0) == r.getSeq[Long](1)
    })
  }

  test("null vector and null element match the composed " +
    "all-zero-band quirk") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("v", ArrayType(FloatType, containsNull = true))))
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(1.0f, 2.0f)), Row(Seq(1.0f, null)), Row(null)),
      schema)
    val got = rows.select(
      Vectors.hyperplaneBands(col("v"), 3, 5).as("n"),
      Vectors.hyperplaneBandsComposed(col("v"), 3, 5).as("c")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    // composed quirk: null vector AND null element both degrade to the
    // all-zero band array, never to null
    assert(got.count(_.isNullAt(0)) === 0)
    assert(got.count(_.getSeq[Long](0) == Seq(0L, 0L, 0L)) === 2)
  }

  test("deterministic across evaluations (no RNG state)") {
    val v = Seq(Tuple1(Array(0.5f, -1.5f, 2.5f))).toDF("v")
    val a = v.select(Vectors.hyperplaneBands(col("v"), 8, 8)).collect()
    val b = v.select(Vectors.hyperplaneBands(col("v"), 8, 8)).collect()
    assert(a.head.getSeq[Long](0) == b.head.getSeq[Long](0))
  }
}
