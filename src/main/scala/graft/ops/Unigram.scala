package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training and application (Kudo,
  * "Subword Regularization", ACL 2018 — the SentencePiece unigram
  * model): the OTHER production tokenizer family beside [[Bpe]]. A
  * vocabulary of pieces with probabilities is fit by EM; a word's
  * tokenization is its maximum-likelihood segmentation (Viterbi over
  * the piece lattice). Trained here as HARD (Viterbi) EM — the E-step
  * assigns each word its single best segmentation instead of
  * forward-backward expected counts; stated plainly because it is the
  * one simplification vs the paper (sentencepiece ships Viterbi
  * segmentation for inference and this variant converges to the same
  * fixed points on capped dicts; hard EM's likelihood is monotone
  * non-decreasing at fixed vocabulary, which the spec pins).
  *
  * Scale posture (the [[Bpe]] discipline, verbatim):
  *  - the corpus is touched EXACTLY ONCE — [[Bpe.wordFreqDict]]'s
  *    explode + map-side-combined groupBy + TakeOrdered top-`topWords`
  *    cut (driver-sized by contract);
  *  - the E-step is DISTRIBUTED over the distinct words of that capped
  *    dict (one tiny job per iteration: Viterbi per word with the
  *    broadcast piece table, explode pieces, freq-weighted BIGINT count
  *    aggregation — exact, so training is partitioning-independent);
  *  - the M-step runs driver-side over the capped piece table
  *    (≤ `seedSize` rows);
  *  - APPLICATION ([[encode]]) segments only DISTINCT corpus words and
  *    re-attaches by equi-join — the Zipf amortization.
  *
  * Pieces are concatenations of [[Bpe.symsOf]]'s atomic symbols (the
  * escape-aware char symbols + the `</w>` end-of-word marker), so the
  * single-symbol pieces — ALWAYS kept — make every word segmentable
  * (losslessness by construction) and [[Bpe.decodeTokens]] /
  * [[Bpe.decodeString]] decode unigram streams unchanged.
  *
  * Training loop: seed → `emRounds` EM iterations at FIXED vocabulary
  * (monotone likelihood) → prune-and-resettle rounds, each dropping the
  * bottom `1 − shrink` of multi-symbol pieces by (count asc, piece
  * desc) and running one EM iteration, until ≤ `vocabSize` pieces
  * remain — the sentencepiece shrink schedule. Ties are total
  * everywhere (counts are exact longs; the Viterbi tie-break is
  * first-best in a fixed scan order), so the same corpus yields the
  * same vocabulary on every run and any partitioning. */
object Unigram {

  /** Trained model: pieces with log-probabilities, plus the Viterbi
    * corpus log-likelihood after each EM iteration (the monotonicity
    * witness — spec/gate surface). */
  final case class Model(vocab: Seq[(String, Double)],
                         likelihoods: Seq[Double]) {
    def logp: Map[String, Double] = vocab.toMap
    /** Longest piece in SYMBOLS (the Viterbi scan bound). */
    def maxLen: Int = vocab.map(p => symLen(p._1)).max
  }

  /** Symbol length of a piece (atomic symbols, not chars): the escape
    * makes every symbol 1 char except `<`+NUL / NUL+NUL (2 chars) and
    * the 4-char `</w>` marker. The walk is unambiguous: a 2-char symbol
    * always STARTS with `<` or NUL, and text characters can never spell
    * the literal marker (a text `<` is always followed by NUL). */
  private[graft] def symLen(piece: String): Int = {
    var i = 0; var n = 0
    while (i < piece.length) {
      val c = piece.charAt(i)
      if (piece.startsWith(Bpe.Eow, i)) i += Bpe.Eow.length
      else if (c == '<' || c == Bpe.Esc) i += 2
      else i += 1
      n += 1
    }
    n
  }

  /** Maximum-likelihood segmentation of one word under the piece
    * table: Viterbi over symbol positions, O(len × maxLen) lookups.
    * Deterministic tie-break: strict improvement in a fixed scan order
    * (start positions ascending), so equal-likelihood lattices always
    * pick the same path. Single-symbol pieces are always in a trained
    * vocab, so a path always exists for words whose symbols training
    * saw; unseen symbols fall back to themselves (lossless encode of
    * out-of-dict text, scored as if present — the honest OOV story). */
  private[graft] def viterbiSegment(word: String,
                                    logp: Map[String, Double],
                                    maxLen: Int): Seq[String] = {
    val syms = Bpe.symsOf(word)
    val m = syms.length
    val pref = new Array[String](m + 1)
    pref(0) = ""
    var i = 0
    while (i < m) { pref(i + 1) = pref(i) + syms(i); i += 1 }
    def piece(a: Int, b: Int): String = pref(b).substring(pref(a).length)
    val best = Array.fill(m + 1)(Double.NegativeInfinity)
    val back = new Array[Int](m + 1)
    best(0) = 0.0
    var j = 1
    while (j <= m) {
      var i0 = math.max(0, j - maxLen)
      while (i0 < j) {
        if (best(i0) != Double.NegativeInfinity) {
          val lpOpt = logp.get(piece(i0, j))
          val lp = lpOpt.getOrElse(
            // unseen single symbol: representable, floor-scored
            if (j - i0 == 1) UnseenLogp else Double.NegativeInfinity)
          if (lp != Double.NegativeInfinity) {
            val cand = best(i0) + lp
            if (cand > best(j)) { best(j) = cand; back(j) = i0 }
          }
        }
        i0 += 1
      }
      j += 1
    }
    val out = List.newBuilder[String]
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var cur = m
    while (cur > 0) { stack += ((back(cur), cur)); cur = back(cur) }
    stack.reverseIterator.foreach { case (a, b) => out += piece(a, b) }
    out.result()
  }

  /** Floor log-prob for symbols outside the trained table (an encode of
    * genuinely unseen text): far below any trained piece, so it is only
    * used when nothing else can cover the symbol. */
  private val UnseenLogp = -1e9

  /** Corpus Viterbi log-likelihood under a model: Σ freq · best-path
    * score. Driver arithmetic over the capped dict. */
  private[graft] def likelihood(dict: Seq[(String, Long)],
                                logp: Map[String, Double],
                                maxLen: Int): Double =
    dict.iterator.map { case (w, f) =>
      val segs = viterbiSegment(w, logp, maxLen)
      f.toDouble * segs.map(p => logp.getOrElse(p, UnseenLogp)).sum
    }.sum

  /** Seed vocabulary: every ≤ `maxPieceLen`-symbol substring of the
    * dict words scored by freq-weighted occurrence count, cut to the
    * top `seedSize` by (count desc, piece asc) — single-symbol pieces
    * always kept regardless of the cut. */
  private[graft] def seed(dict: Seq[(String, Long)], seedSize: Int,
                          maxPieceLen: Int): Seq[(String, Long)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    dict.foreach { case (w, f) =>
      val syms = Bpe.symsOf(w)
      var i = 0
      while (i < syms.length) {
        var j = i + 1
        val sb = new java.lang.StringBuilder
        while (j <= math.min(syms.length, i + maxPieceLen)) {
          sb.append(syms(j - 1))
          val p = sb.toString
          counts(p) = counts.getOrElse(p, 0L) + f
          j += 1
        }
        i += 1
      }
    }
    val (singles, multis) = counts.toSeq.partition(p => symLen(p._1) == 1)
    singles ++ multis.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - singles.size))
  }

  /** M-step over exact counts: log(count / total), smoothed by +1 on
    * every kept piece so a zero-count survivor (a protected single
    * symbol nothing currently selects) stays finite. Pure function of
    * longs — deterministic. */
  private def mStep(counts: Seq[(String, Long)]): Map[String, Double] = {
    val total = counts.iterator.map(_._2 + 1L).sum.toDouble
    counts.iterator.map { case (p, c) =>
      p -> math.log((c + 1L).toDouble / total)
    }.toMap
  }

  /** One distributed E-step: Viterbi counts of every piece over the
    * distinct dict words, freq-weighted, exact BIGINT. */
  private def eStep(spark: org.apache.spark.sql.SparkSession,
                    dict: Seq[(String, Long)],
                    logp: Map[String, Double],
                    maxLen: Int): Map[String, Long] = {
    import spark.implicits._
    val seg = udf((w: String, f: Long) =>
      viterbiSegment(w, logp, maxLen).map(p => (p, f)))
    dict.toDF("word", "freq")
      .select(explode(seg(col("word"), col("freq"))).as("pf"))
      .groupBy(col("pf._1").as("piece"))
      .agg(sum(col("pf._2")).as("n"))
      .as[(String, Long)].collect().toMap
  }

  /** Train a unigram model. `vocabSize` counts ALL pieces (single
    * symbols included); the result may exceed it only when the single
    * symbols alone do (they are never pruned). */
  def train(docs: DataFrame, vocabSize: Int, emRounds: Int = 2,
            seedSize: Int = 8000, topWords: Int = 100000,
            maxPieceLen: Int = 8, shrink: Double = 0.75,
            textCol: String = "text"): Model =
    trainOnDict(docs.sparkSession,
      Bpe.wordFreqDict(docs, textCol, topWords), vocabSize, emRounds,
      seedSize, maxPieceLen, shrink)

  /** The training loop over a captured (word, freq) dict — separated so
    * the spec and the worked-example gate can drive it against hand
    * arithmetic (the [[Bpe.trainOnDict]] posture). */
  private[graft] def trainOnDict(spark: org.apache.spark.sql.SparkSession,
                                 dict: Seq[(String, Long)], vocabSize: Int,
                                 emRounds: Int = 2, seedSize: Int = 8000,
                                 maxPieceLen: Int = 8,
                                 shrink: Double = 0.75): Model = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    require(emRounds >= 1, s"emRounds must be positive, got $emRounds")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(shrink > 0.0 && shrink < 1.0,
      s"shrink must be in (0, 1), got $shrink")
    require(dict.nonEmpty, "unigram training needs a non-empty word dict")
    var pieces: Seq[(String, Long)] = seed(dict, seedSize, maxPieceLen)
    var logp = mStep(pieces)
    var maxLen = pieces.iterator.map(p => symLen(p._1)).max
    val lls = Vector.newBuilder[Double]
    def em(): Unit = {
      val counts = eStep(spark, dict, logp, maxLen)
      pieces = pieces.map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
      logp = mStep(pieces)
      lls += likelihood(dict, logp, maxLen)
    }
    // fixed-vocabulary EM: hard-EM likelihood is monotone here (pinned)
    (0 until emRounds).foreach(_ => em())
    // prune-and-resettle: drop the bottom of the multi-symbol pieces by
    // (count asc, piece desc), keep every single symbol, re-run one EM.
    // The shrink schedule is geometric, floored at the target, so the
    // loop runs O(log_{1/shrink}(seed/vocab)) rounds; when the single
    // symbols alone exceed vocabSize the result honestly exceeds it
    // (losslessness is not for sale — scaladoc contract).
    var pruning = pieces.size > vocabSize
    while (pruning) {
      val (singles, multis) = pieces.partition(p => symLen(p._1) == 1)
      val target = math.max(0, vocabSize - singles.size)
      if (multis.size <= target) pruning = false
      else {
        val keep = math.max(target, (multis.size * shrink).toInt)
        pieces = singles ++
          multis.sortBy { case (p, c) => (-c, p) }.take(keep)
        logp = mStep(pieces)
        maxLen = pieces.iterator.map(p => symLen(p._1)).max
        em()
        if (keep == target) pruning = false
      }
    }
    Model(pieces.sortBy { case (p, c) => (-c, p) }
      .map { case (p, _) => (p, logp(p)) }, lls.result())
  }

  /** Distributed ENCODE — the [[Bpe.encode]] shape for the unigram
    * family: `(idCol, tokens, n_unigram_tokens)` per document, the
    * Viterbi recursion amortized over DISTINCT words, stream
    * reassembled by one sort-under-aggregation. `concat(tokens)`
    * decodes with [[Bpe.decodeTokens]] exactly (pieces concatenate to
    * the escaped words + markers). */
  def encode(docs: DataFrame, model: Model,
             idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val logp = model.logp
    val maxLen = model.maxLen
    val segTokens = udf((w: String) => viterbiSegment(w, logp, maxLen))
    val words = docs.select(col(idCol),
      posexplode(split(TextAnalysis.normalized(col(textCol)), " ")))
      .toDF(idCol, "pos", "word")
      .filter(length(col("word")) > 0)
    val dictSeg = words.select("word").distinct()
      .withColumn("toks", segTokens(col("word")))
    words.join(dictSeg, "word")
      .groupBy(idCol)
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("toks"))))
        .getField("toks")).as("tokens"))
      .select(col(idCol), col("tokens"),
        size(col("tokens")).cast("long").as("n_unigram_tokens"))
  }
}
