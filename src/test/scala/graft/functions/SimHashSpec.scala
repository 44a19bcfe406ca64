package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, TextAnalysis}

/** The native SimHash kernel must be bit-indistinguishable from the
  * composed HOF family — d_simhash_invariant pins twin Hamming distances
  * and simHashPairs' band pigeonhole both depend on the exact bits. */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private def bothEqual(df: org.apache.spark.sql.DataFrame,
                        sh: org.apache.spark.sql.Column): Unit = {
    val got = df.select(
        Dedup.simHash(sh).as("native"),
        Dedup.simHashComposed(sh).as("composed"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, c) => assert(n === c) }
  }

  test("native == composed over shingle hashes on golden and degenerate " +
    "docs") {
    bothEqual(Seq(
      "the cat sat on the mat the cat sat again",
      "unique words only here",
      "spam",
      "",
      "   ",
      "MiXeD CaSe AND Ünïcödé wörds ünïcödé here today").toDF("text"),
      TextAnalysis.wordShingleHashes(col("text"), 3))
  }

  test("native == composed on random word soup") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "Gamma", "δelta", "e", "ff", "GGG")
    bothEqual((0 until 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }.toDF("text"), TextAnalysis.wordShingleHashes(col("text"), 3))
  }

  test("native == composed on raw long arrays incl. null elements, empty " +
    "arrays, extreme values") {
    val rows: Seq[Seq[java.lang.Long]] = Seq(
      Seq(1L, 2L, 3L).map(Long.box),
      Seq.empty[java.lang.Long],
      Seq(null, Long.box(7L)),
      Seq(Long.box(Long.MinValue), Long.box(Long.MaxValue), Long.box(-1L)),
      Seq(Long.box(42L)))
    bothEqual(rows.toDF("sh"), col("sh"))
  }
}
