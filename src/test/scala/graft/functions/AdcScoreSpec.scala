package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

import graft.SparkSpec

/** The native ADC kernel must be bit-indistinguishable from the composed
  * `aggregate(zip_with(...))` family — PQ/IVFADC candidate ranking
  * depends on the exact scores. */
class AdcScoreSpec extends SparkSpec {
  import spark.implicits._

  private def native(c: org.apache.spark.sql.Column,
                     t: org.apache.spark.sql.Column) =
    ColumnShim.column(AdcScore(
      ColumnShim.expression(c), ColumnShim.expression(t)))

  test("golden: sums the indexed cells; edge shapes go null like composed") {
    val rows = Seq(
      // matched lengths, valid codes -> 1.5 + 0.25 = 1.75
      (Seq(1, 0), Seq(Seq(0.5, 1.5), Seq(0.25, 0.75))),
      // out-of-range code
      (Seq(5, 0), Seq(Seq(0.5, 1.5), Seq(0.25, 0.75))),
      // length mismatch (zip_with pads -> null)
      (Seq(1), Seq(Seq(0.5, 1.5), Seq(0.25, 0.75))),
      // empty both -> 0.0
      (Seq.empty[Int], Seq.empty[Seq[Double]]))
      .toDF("codes", "dtab")
    val got = rows.select(
      native(col("codes"), col("dtab")).as("n"),
      graft.ops.ProductQuantization.adcScoreComposed(col("codes"),
        col("dtab")).as("c")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
    assert(got(0).getDouble(0) === 1.75)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
    assert(got(3).getDouble(0) === 0.0)
  }

  test("property: native == composed on random codes/tables") {
    val rnd = new scala.util.Random(17)
    // codes in [0, k]: valid indices plus out-of-range-high (encoders
    // never emit negatives, and element_at's negative-index wrap-around
    // is intentionally not reproduced by the kernel)
    val rows = (0 until 300).map { _ =>
      val m = rnd.nextInt(6)
      val k = 1 + rnd.nextInt(4)
      val codes = Seq.fill(m)(rnd.nextInt(k + 1))
      val dtab = Seq.fill(if (rnd.nextInt(8) == 0) m + 1 else m)(
        Seq.fill(k)(rnd.nextDouble()))
      (codes, dtab)
    }.toDF("codes", "dtab")
    val got = rows.select(
      native(col("codes"), col("dtab")).as("n"),
      graft.ops.ProductQuantization.adcScoreComposed(col("codes"),
        col("dtab")).as("c")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) === r.getDouble(1))
    }
  }
}
