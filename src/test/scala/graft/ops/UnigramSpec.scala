package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the unigram-LM tokenizer's contracts: Viterbi segmentation on a
  * worked example, hard-EM likelihood monotonicity at fixed vocabulary,
  * per-iteration pruning on a hand-checkable dict, round-trip
  * losslessness over every distinct corpus word (escape cases
  * included), and partitioning-independence of training. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the maximum-likelihood path on a worked lattice") {
    // pieces over 'abab</w>': with p(ab) >> p(a), p(b), the best path
    // is [ab, ab, </w>]; with p(ab) tiny it falls back to singles
    val rich = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0,
      Bpe.Eow -> -1.0)
    assert(Unigram.viterbiSegment("abab", rich, 2) ==
      Seq("ab", "ab", Bpe.Eow))
    val poor = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -9.0,
      Bpe.Eow -> -1.0)
    assert(Unigram.viterbiSegment("abab", poor, 2) ==
      Seq("a", "b", "a", "b", Bpe.Eow))
    // a longer known piece wins over two shorter ones when cheaper
    val tri = Map("a" -> -2.0, "b" -> -2.0, "ab" -> -3.5, "aba" -> -2.5,
      Bpe.Eow -> -1.0)
    assert(Unigram.viterbiSegment("abab", tri, 3) ==
      Seq("aba", "b", Bpe.Eow))
  }

  test("symLen counts atomic symbols through the escape and the marker") {
    assert(Unigram.symLen("ab") == 2)
    assert(Unigram.symLen(Bpe.Eow) == 1)
    assert(Unigram.symLen("ab" + Bpe.Eow) == 3)
    // a text '<' escapes to 2 chars but ONE symbol
    assert(Unigram.symLen("<" + Bpe.Esc + "a") == 2)
    assert(Unigram.symLen(Bpe.Esc.toString + Bpe.Esc) == 1)
  }

  test("worked example: seed counts, EM settles on the repeated bigram, " +
    "pruning keeps the winners and drops zero-count pieces") {
    // dict: 'ab' x10, 'cd' x1 — substring seeds (maxLen 2, symbols):
    // a:10 b:10 ab:10 b</w>:10 (and c/d twins x1); 'ab</w>' is 3
    // symbols so never a seed piece
    val dict = Seq(("ab", 10L), ("cd", 1L))
    val sd = Unigram.seed(dict, seedSize = 100, maxPieceLen = 2).toMap
    assert(sd("a") == 10L && sd("ab") == 10L && sd("b" + Bpe.Eow) == 10L)
    assert(sd("c") == 1L && sd("cd") == 1L && sd(Bpe.Eow) == 11L)
    val model = Unigram.trainOnDict(spark, dict, vocabSize = 8,
      emRounds = 2, seedSize = 100, maxPieceLen = 2)
    val vocab = model.vocab.map(_._1).toSet
    // the frequent multi-symbol pieces survive the prune; every single
    // symbol is protected
    assert(vocab.contains("ab") && vocab.contains("b" + Bpe.Eow))
    assert(Seq("a", "b", "c", "d", Bpe.Eow).forall(vocab.contains))
    assert(model.vocab.size <= 8)
    // Viterbi under the trained model segments the trained words the
    // way the counts say it should: 'ab' -> [ab, b</w>]? no — pieces
    // tile the word: [ab, </w>] or [a, b</w>]; both are 2 pieces. The
    // trained probabilities make the segmentation deterministic:
    val segs = Unigram.viterbiSegment("ab", model.logp, model.maxLen)
    assert(segs.mkString == "ab" + Bpe.Eow && segs.length == 2)
  }

  test("hard-EM likelihood is monotone non-decreasing at fixed " +
    "vocabulary") {
    val dict = Seq(("spark", 30L), ("sparkly", 10L), ("park", 20L),
      ("bark", 5L), ("sparse", 7L), ("spar", 3L))
    val model = Unigram.trainOnDict(spark, dict, vocabSize = 40,
      emRounds = 4, seedSize = 200, maxPieceLen = 4)
    val fixedPhase = model.likelihoods.take(4)
    assert(fixedPhase.size == 4)
    fixedPhase.sliding(2).foreach { w =>
      assert(w(1) >= w(0) - 1e-9, s"likelihood regressed: $fixedPhase")
    }
  }

  test("round-trip losslessness over every distinct corpus word, " +
    "including escape torture cases; encode equals per-word viterbi") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat naps under the warm sun"),
      (3L, "angle brackets a<b and literal </w> marker inside text"),
      (4L, "repeated repeated repeated words words tokens tokens")
    ).toDF("doc_id", "text")
    val model = Unigram.train(docs, vocabSize = 120, emRounds = 2,
      seedSize = 300, maxPieceLen = 4)
    val logp = model.logp
    val maxLen = model.maxLen
    val rt = udf((w: String) =>
      Bpe.decodeString(
        Unigram.viterbiSegment(w, logp, maxLen).mkString) == w + " ")
    val lossless = docs
      .select(explode(split(TextAnalysis.normalized(col("text")), " "))
        .as("word"))
      .filter(length(col("word")) > 0).distinct()
      .agg(min(rt(col("word")))).head.getBoolean(0)
    assert(lossless)
    // full encode decodes to the normalized text (the t_bpe_encode
    // round-trip, unigram face)
    val enc = Unigram.encode(docs, model)
    val bad = enc.join(docs, "doc_id")
      .select(Bpe.decodeTokens(col("tokens")) ===
        concat(TextAnalysis.normalized(col("text")), lit(" ")))
      .as[Boolean].collect()
    assert(bad.forall(identity))
  }

  test("training is partitioning-independent and deterministic") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"alpha beta gamma delta word$i beta gamma"))
      .toDF("doc_id", "text")
    val m1 = Unigram.train(docs, vocabSize = 80, emRounds = 2,
      seedSize = 200, maxPieceLen = 3)
    val m2 = Unigram.train(docs.repartition(7), vocabSize = 80,
      emRounds = 2, seedSize = 200, maxPieceLen = 3)
    assert(m1.vocab == m2.vocab)
  }

  test("bad params fail fast") {
    intercept[IllegalArgumentException](
      Unigram.trainOnDict(spark, Seq(("a", 1L)), vocabSize = 0))
    intercept[IllegalArgumentException](
      Unigram.trainOnDict(spark, Seq(("a", 1L)), vocabSize = 5,
        shrink = 1.0))
    intercept[IllegalArgumentException](
      Unigram.trainOnDict(spark, Nil, vocabSize = 5))
  }
}
