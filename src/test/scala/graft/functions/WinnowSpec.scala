package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextAnalysis

/** The native winnowing kernel must be bit-indistinguishable from the
  * composed reference family on non-null text — the contamination /
  * overlap checks depend on the exact selected hash values. (Null text:
  * the kernel returns null; the composed chain degrades to `[null]`
  * through the `size(null) = -1` legacy quirk — an accident, not a
  * contract, so nulls are excluded from the equality property.) */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "The  quick\tbrown\nfox  ",
    "short",
    "tiny",
    "exactly11ch",
    "",
    "   ",
    "MiXeD CaSe AND Ünïcödé wörds ünïcödé here",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "abababababababababababababab",
    "punct, marks! and? stuff; here: too.")

  test("winnowFingerprints: native == composed over (k, w) grid") {
    val df = texts.toDF("text")
    for (k <- Seq(2, 5, 8); w <- Seq(1, 3, 4, 9)) {
      val both = df.select(
        TextAnalysis.winnowFingerprints(col("text"), k, w).as("native"),
        TextAnalysis.winnowFingerprintsComposed(col("text"), k, w)
          .as("composed"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"k=$k w=$w")
      }
    }
  }

  test("winnowFingerprints: native == composed on random text") {
    val rnd = new scala.util.Random(29)
    val alphabet = "abcdefg hij"
    val docs = (0 until 300).map { _ =>
      (0 until rnd.nextInt(120)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }.toDF("text")
    val both = docs.select(
      TextAnalysis.winnowFingerprints(col("text")).as("native"),
      TextAnalysis.winnowFingerprintsComposed(col("text")).as("composed"))
      .collect()
    assert(both.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }
}
