package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and application (Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016) — the tokenizer-TRAINING step beyond the token-counting and
  * vocabulary-curve operators ([[TextAnalysis.bpeTokenCount]],
  * [[TrainingPrep.vocabulary]]).
  *
  * Scale posture (how production tokenizer training actually runs at
  * 100 TB):
  *  - the corpus is touched EXACTLY ONCE, by the word-frequency dict pass
  *    (explode + hash-groupBy with map-side combine, then a TakeOrdered
  *    top-`topWords` cut — per-partition heads merged on the driver, the
  *    same driver-sized-by-contract posture as
  *    [[ProductQuantization.train]]'s Lloyd sample and
  *    [[TrainingPrep.lmScore]]'s vocabulary);
  *  - the merge LOOP runs driver-side over that capped dict — each round
  *    is a weighted pair count over ≤ topWords short symbol arrays, which
  *    is microseconds at any corpus scale and EXACT over the captured
  *    mass (this is precisely how HuggingFace/fastBPE train: on word
  *    counts, not on the corpus);
  *  - APPLICATION ([[segment]]) is distributed, but the per-word merge
  *    recursion runs only on the DISTINCT words of the corpus — the
  *    dict-sized frame — and the corpus re-attaches by equi-join, so the
  *    hot path is a join + aggregation and the non-codegen word
  *    segmentation cost is amortized over every duplicate occurrence
  *    (Zipf makes that amortization enormous).
  *
  * Words are the [[TextAnalysis.normalized]] whitespace tokens, each
  * terminated with the classic `</w>` end-of-word symbol, so merges can
  * learn suffix units. Tie-breaks are total and deterministic everywhere:
  * pair counts break (count desc, pair lexicographic), so the same corpus
  * yields the same merge table on every run and any partitioning.
  */
object Bpe {

  /** End-of-word marker symbol. Escape-safe against corpus text that
    * contains the literal `</w>`: [[symsOf]] maps the character `<` to
    * the ATOMIC 2-char symbol `<`+NUL (and NUL itself to NUL+NUL), so in
    * any concatenation of symbols every `<` that came from TEXT is
    * followed by NUL — the marker string is unspellable by corpus
    * characters and [[decodeTokens]]/[[decodeString]] are lossless. The
    * escape is one SYMBOL per character, so symbol counts (and the
    * len+1 token-count contract `t_pack_ids` pins) are unchanged. */
  val Eow = "</w>"

  /** Escape character appended inside the `<` symbol (a NUL — legal in
    * corpus text, which is why it is escaped by doubling too). */
  private[ops] val Esc = '\u0000'

  /** Escaped text of a word: what `concat` of its char-level symbols
    * yields. One symbol per character, so `escape(w).length >= w.length`
    * but the SYMBOL count equals `w.length`. */
  private[graft] def escape(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length + 4)
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      sb.append(c)
      if (c == '<' || c == Esc) sb.append(Esc)
      i += 1
    }
    sb.toString
  }

  /** A word as its current symbol sequence (escape-aware; see [[Eow]]).
    * Shared with [[Unigram]] — both tokenizer families segment the SAME
    * atomic-symbol stream, so their decode/round-trip contracts are one
    * escape discipline. */
  private[ops] def symsOf(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    word.foreach { c =>
      if (c == '<' || c == Esc) b += new String(Array(c, Esc))
      else b += c.toString
    }
    b += Eow
    b.result()
  }

  /** Scalar decode of a concatenated symbol stream back to text: marker →
    * space, then un-escape (`<`+NUL → `<`, NUL+NUL → NUL — in THAT order,
    * the reverse of [[escape]]). `decodeString(segmentWord(w).mkString)`
    * == `w + " "` for EVERY string `w`, including ones containing the
    * literal `</w>`. */
  private[graft] def decodeString(s: String): String =
    s.replace(Eow, " ")
      .replace(new String(Array('<', Esc)), "<")
      .replace(new String(Array(Esc, Esc)), Esc.toString)

  /** Column decode of a token array (the [[encode]]/`packTokens` shape)
    * back to the space-joined normalized text — the round-trip face the
    * `t_bpe_encode`/`t_pack_ids` gates md5-compare. Literal (non-regex)
    * replaces, codegen'd. */
  def decodeTokens(tokens: Column): Column = {
    val escS = Esc.toString
    replace(
      replace(
        replace(concat_ws("", tokens), lit(Eow), lit(" ")),
        lit("<" + escS), lit("<")),
      lit(escS + escS), lit(escS))
  }

  /** Distributed word-frequency dict pass: the ONE corpus scan. Top
    * `topWords` by (count desc, word asc) — a TakeOrdered, driver-sized
    * by contract. */
  private[ops] def wordFreqDict(docs: DataFrame, textCol: String,
                                topWords: Int): Seq[(String, Long)] =
    docs.select(explode(split(TextAnalysis.normalized(col(textCol)), " "))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(topWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Learn `numMerges` merges from the corpus. Returns the merge table in
    * learned order (highest-priority first); training stops early when no
    * pair occurs at least `minFrequency` times. */
  def train(docs: DataFrame, numMerges: Int, topWords: Int = 100000,
            minFrequency: Long = 2,
            textCol: String = "text"): Seq[(String, String)] =
    trainOnDict(wordFreqDict(docs, textCol, topWords), numMerges,
      minFrequency)

  /** The exact BPE loop over a (word, freq) dict — driver arithmetic,
    * separated from the Spark pass so the spec and the gate can drive it
    * against an independent reference. */
  private[graft] def trainOnDict(dict: Seq[(String, Long)], numMerges: Int,
                                 minFrequency: Long = 2)
      : Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words = dict.map { case (w, f) => (symsOf(w), f) }
    val merges = Vector.newBuilder[(String, String)]
    var done = false
    var it = 0
    while (!done && it < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (best, n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < minFrequency) done = true
        else {
          merges += best
          words = words.map { case (syms, f) => (mergePair(syms, best), f) }
          it += 1
        }
      }
    }
    merges.result()
  }

  /** One left-to-right non-overlapping merge pass ("aaa" + (a,a) →
    * ["aa", "a"], never ["a", "aa"]). */
  private def mergePair(syms: Vector[String],
                        pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Segment ONE word with a trained merge table: repeatedly apply the
    * highest-priority (lowest-rank) merge present until none applies —
    * the standard application algorithm, which reproduces training's
    * segmentation for every word training saw. */
  private[graft] def segmentWord(word: String,
                                 ranks: Map[(String, String), Int])
      : Seq[String] = {
    var syms = symsOf(word)
    var continue = syms.length > 1
    while (continue) {
      val present = syms.indices.dropRight(1)
        .flatMap(i => ranks.get((syms(i), syms(i + 1))))
      if (present.isEmpty) continue = false
      else {
        val bestRank = present.min
        val pair = ranks.collectFirst {
          case (p, r) if r == bestRank => p
        }.get
        syms = mergePair(syms, pair)
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Distributed application: (idCol, n_words, n_bpe_tokens) per document.
    * The segmentation recursion runs ONCE PER DISTINCT WORD (dict-sized
    * frame, merge table broadcast in the closure); the corpus attaches
    * its per-occurrence word stream by equi-join on the word and
    * aggregates token counts per document — joins and hash aggregations
    * only on the corpus-sized side. */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)],
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val nToks = udf((w: String) => segmentWord(w, ranks).length)
    val words = docs.select(col(idCol),
      explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val dictSeg = words.select("word").distinct()
      .withColumn("n_toks", nToks(col("word")))
    words.join(dictSeg, "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_toks")).as("n_bpe_tokens"))
  }

  /** Full distributed ENCODE: the per-document subword token stream,
    * `(idCol, tokens: array<string>, n_bpe_tokens)` — what a training
    * pipeline feeds the packer. Same amortization as [[tokenCounts]]:
    * the merge recursion runs once per DISTINCT word (dict-sized frame,
    * table broadcast in the closure); the corpus side keeps each word's
    * position through the join and reassembles the ordered stream with
    * one sort-under-aggregation per document — a single shuffle on doc
    * id, no window. Word tokens carry the trailing [[Eow]] marker, so
    * `concat(tokens)` with `</w>` → `' '` reproduces the normalized text
    * exactly (the round-trip the `t_bpe_encode` gate checks). */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val segTokens = udf((w: String) => segmentWord(w, ranks))
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
        size(col("tokens")).cast("long").as("n_bpe_tokens"))
  }
}
