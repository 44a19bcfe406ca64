package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextAnalysis

/** The native repetition kernel must be bit-indistinguishable from the
  * composed reference family — t_repetition is a value-exact oracle
  * query and t_curate_v2 filters on the exact rounded fractions. */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private val cols =
    Seq("n_words", "dup_word_frac", "dup_bigram_frac", "max_word_freq_frac")

  private def bothEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val native = TextAnalysis.repetitionMetrics(df).select(cols.map(col): _*)
    val composed = TextAnalysis.repetitionMetricsComposed(df)
      .select(cols.map(col): _*)
    val n = native.collect().toSeq
    val c = composed.collect().toSeq
    assert(n === c)
  }

  test("native == composed on golden and degenerate docs") {
    bothEqual(Seq(
      "the cat sat on the mat the cat",
      "unique words only here",
      "spam",
      "go go go go",
      "The  quick\tbrown\nfox  ",
      "",
      "   ",
      "MiXeD CaSe AND Ünïcödé wörds ünïcödé here",
      "a a a b b c").toDF("text"))
  }

  test("native == composed on random word soup") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "Gamma", "δelta", "e", "ff", "GGG")
    bothEqual((0 until 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }.toDF("text"))
  }
}
