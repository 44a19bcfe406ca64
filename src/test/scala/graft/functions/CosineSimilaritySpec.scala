package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native codegen'd cosine kernel must be indistinguishable from the
  * `functions`-composed reference implementation. */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native == composed on random float vectors (both eval paths)") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(24)(rnd.nextGaussian().toFloat),
        Array.fill(24)(rnd.nextGaussian().toFloat))
    }.toDF("id", "a", "b")
    val both = vecs.select(
      Vectors.cosine(col("a"), col("b")).as("native"),
      Vectors.cosineComposed(col("a"), col("b")).as("composed"))
    assert(both.collect().forall { r =>
      r.getDouble(0) == r.getDouble(1) // bit-identical, not just approx
    })
  }

  test("null/zero/mismatch semantics match the composed form") {
    val rows = Seq(
      (Array(1.0f, 2.0f), Array(2.0f, 1.0f)),       // plain
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),       // zero norm -> null
      (Array(1.0f), Array(1.0f, 1.0f)),             // length mismatch -> null
      (null.asInstanceOf[Array[Float]], Array(1.0f)) // null input -> null
    ).toDF("a", "b")
    val got = rows.select(
      Vectors.cosine(col("a"), col("b")).as("n"),
      Vectors.cosineComposed(col("a"), col("b")).as("c")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(got.count(_.isNullAt(0)) === 3)
  }

  test("double arrays and mixed float/double inputs work") {
    val df = Seq((Array(1.0, 0.0), Array(1.0f, 0.0f))).toDF("d", "f")
    val r = df.select(Vectors.cosine(col("d"), col("f")).as("c"))
      .collect().head
    assert(r.getDouble(0) === 1.0)
  }

  test("graft_cosine is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c")
      .collect().head
    assert(r.getDouble(0) === 1.0)
  }
}
