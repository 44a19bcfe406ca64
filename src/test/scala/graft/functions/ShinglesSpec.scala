package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, TextAnalysis}

/** The native shingle-hash and MinHash kernels must be
  * bit-indistinguishable from their composed reference families — the
  * dedup pipelines' candidate generation and verification depend on the
  * exact hash values. */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "The  quick\tbrown\nfox  ",
    "short",
    "two words",
    "",
    "   ",
    "MiXeD CaSe AND Ünïcödé wörds ünïcödé here",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "dup dup dup dup dup dup",
    "punct, marks! and? stuff; here: too."
  )

  test("wordShingleHashes: native == composed for n in 1..4, incl. " +
    "whitespace runs, unicode, empties and nulls") {
    val df = (texts.map(Option(_)) :+ None).toDF("text")
    for (n <- 1 to 4) {
      val both = df.select(
        TextAnalysis.wordShingleHashes(col("text"), n).as("native"),
        TextAnalysis.wordShingleHashesComposed(col("text"), n).as("composed"))
        .collect()
      both.foreach { r =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch at n=$n")
        if (!r.isNullAt(0))
          assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("wordShingleHashes: native == composed on random word soup") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("alpha", "beta", "Gamma", "δelta", "e", "ff", "GGG")
    val docs = (0 until 200).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }.toDF("text")
    val both = docs.select(
      TextAnalysis.wordShingleHashes(col("text"), 3).as("native"),
      TextAnalysis.wordShingleHashesComposed(col("text"), 3).as("composed"))
      .collect()
    assert(both.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("minHashSignature: native == composed over real shingle arrays") {
    val df = texts.toDF("text").select(
      TextAnalysis.wordShingleHashes(col("text"), 3).as("sh"))
    val both = df.select(
      Dedup.minHashSignature(col("sh"), 96).as("native"),
      Dedup.minHashSignatureComposed(col("sh"), 96).as("composed"))
      .collect()
    assert(both.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("minHashSignature: empty shingle set degrades like the composed " +
    "form (all-null members)") {
    val df = Seq(Seq.empty[Long], Seq(7L, 8L)).toDF("sh")
    val both = df.select(
      Dedup.minHashSignature(col("sh"), 4).as("native"),
      Dedup.minHashSignatureComposed(col("sh"), 4).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[java.lang.Long](0) === r.getSeq[java.lang.Long](1))
    }
  }
}
