package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators that stage a curated corpus into training shards — the last
  * mile of a large-scale training-data pipeline, after dedup/quality
  * filtering and before the trainer reads bytes:
  *
  *  - [[hashSplit]]: deterministic, leakage-free train/val/test
  *    assignment by content-independent id hash;
  *  - [[lmScore]]: CCNet-style (Wenzek et al., LREC 2020) language-model
  *    quality score — here a unigram model with a capped broadcast
  *    vocabulary, the degree that stays one narrow plan on Spark;
  *  - [[packSequences]]: greedy contiguous sequence packing into
  *    fixed-token-budget bins, per shard (how real pipelines pack — a
  *    GLOBAL packing order would need a single-partition window, the
  *    exact funnel the edge-index export avoids).
  *
  * All pure `functions._` chains — codegen'd, no UDFs, oracle-exact.
  */
object TrainingPrep {

  /** Deterministic uniform [0,1) draw from the first 8 hex digits of
    * md5(id || ':' || salt) — the content-independent randomness source
    * [[hashSplit]] and [[resampleBySource]] use. Unlike `rand()`:
    * REPRODUCIBLE (same id → same value, any run, any partitioning) and
    * oracle-exact (md5 hex is byte-identical across engines).
    *
    * The `salt` makes each CONSUMER's draw independent: an unsalted
    * shared draw would perfectly correlate decisions across operators —
    * e.g. resampling a source to w=0.5 keeps exactly the ids with
    * u < 0.5, and a subsequent 80/10/10 hashSplit (train = u < 0.8) would
    * then send EVERY surviving doc of that source to train, starving
    * val/test of all fractionally-downsampled sources. */
  private def hashUniform(id: Column, salt: String): Column =
    pmod(hexDraw(saltedHex(id, salt)), lit(1000000L))
      .cast("double") / 1000000.0

  /** The one salted md5 recipe every deterministic draw derives from —
    * the salt separator and hex width are load-bearing for oracle
    * exactness, so they live in exactly one place. */
  private def saltedHex(id: Column, salt: String): Column =
    md5(concat(id.cast("string"), lit(":" + salt)))

  /** First 8 hex digits of a [[saltedHex]] as a non-negative long. */
  private def hexDraw(hx: Column): Column =
    conv(substring(hx, 1, 8), 16, 10).cast("long")

  /** Deterministic split assignment: [[hashUniform]] thresholded by
    * cumulative weights. Properties a training pipeline needs: same id →
    * same split in every run, and LEAKAGE-FREE under reprocessing (a
    * re-crawled doc keeps its split, so eval never contaminates train
    * across dataset versions).
    * Output: input columns + `split`. Narrow — no shuffle, no state. */
  def hashSplit(df: DataFrame, splits: Seq[(String, Double)],
                idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $splits")
    val u = hashUniform(col(idCol), "split")
    val cums = splits.scanLeft(0.0)(_ + _._2).tail
    val first = when(u < cums.head, splits.head._1)
    val label = splits.tail.zip(cums.tail).dropRight(1)
      .foldLeft(first) { case (acc, ((name, _), cum)) =>
        acc.when(u < cum, name)
      }
      .otherwise(splits.last._1)
    df.withColumn("split", label)
  }

  /** [[hashSplit]] made LEAKAGE-SAFE UNDER DUPLICATION: documents with
    * the same content fingerprint draw their split from ONE
    * representative (the cluster's min id), so exact copies can never
    * straddle train/test — the contamination mode plain per-id splitting
    * has on a deduplicated-later corpus (a re-crawled duplicate of a
    * test document landing in train leaks the eval verbatim). The same
    * shape extends to NEAR-dup clusters: feed the connected-component
    * canonical id ([[graft.ops.Dedup]] pairs → CC) as `clusterCol`
    * instead of letting this compute exact-dup fingerprints.
    *
    * Scale shape: one fingerprint aggregation to the cluster-rep frame,
    * one equi-join back on the fingerprint (both map-side-combinable /
    * shuffle on the fingerprint key), then the narrow [[hashSplit]]
    * threshold on the REP's draw. Reproducible and incremental-safe
    * like hashSplit itself: a cluster's rep never changes when new
    * copies arrive with larger ids (min is monotone under append —
    * id-ordered ingest keeps reps stable). Output: input columns +
    * `cluster_rep`, `split`. */
  def leakageSafeSplit(df: DataFrame, splits: Seq[(String, Double)],
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $splits")
    val fp = TextAnalysis.fingerprint(col(textCol))
    val reps = df.select(fp.as("__fp"), col(idCol))
      .groupBy("__fp").agg(min(col(idCol)).as("cluster_rep"))
    df.withColumn("__fp", fp)
      .join(reps, "__fp")
      .drop("__fp")
      .transform(d => hashSplit(d, splits, idCol = "cluster_rep"))
  }

  /** Deterministic domain-mixing resampler: each document is emitted
    * `floor(w)` times plus one more for a [[hashUniform]]-chosen w−⌊w⌋
    * fraction of its source's documents, where w is the source's mixing
    * weight (the Gopher/Llama-style domain reweighting step, made
    * reproducible: the same doc gets the same copy count every run, so a
    * resumed or re-sharded run sees the identical mixture). Weight 0
    * drops the source; fractional weights downsample it.
    *
    * Scale shape: narrow — the weight lookup is a literal map, the copy
    * fan-out is `explode(sequence(...))` per row; no shuffle, no state,
    * and skew from a heavily-upweighted source stays spread across the
    * scan's partitions. Output: (idCol, sourceCol, copy 1..n). */
  def resampleBySource(df: DataFrame, weights: Map[String, Double],
                       defaultWeight: Double = 1.0,
                       sourceCol: String = "source",
                       idCol: String = "doc_id"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "weights must be non-negative")
    val wt = coalesce(element_at(typedlit(weights), col(sourceCol)),
      lit(defaultWeight))
    val u = hashUniform(col(idCol), "resample")
    val n = (floor(wt) +
      when(u < wt - floor(wt), 1.0).otherwise(0.0)).cast("int")
    df.select(col(idCol), col(sourceCol), n.as("n"))
      .filter(col("n") > 0)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(1), col("n"))).as("copy"))
  }

  /** Unigram log-prob quality score against a reference corpus (CCNet's
    * filter, at the model degree that stays declarative): lower = more
    * like the reference. p(w) = count(w)/total over the reference, with
    * the vocabulary CAPPED at the `vocabSize` most frequent words (count
    * desc, word asc — deterministic) so the probability table is a
    * broadcast dimension no matter the corpus size; out-of-vocabulary
    * words score at the 1/total floor.
    *
    * Scale shape: reference counts are ONE explode + hash-groupBy pass
    * with map-side combine, materialized (lineage cut) at
    * vocabulary size so the total and the top-V cut both read the
    * counts, not the corpus — the reference corpus is scanned exactly
    * once; the top-V cut is a TakeOrdered (per-partition top-V, driver
    * merge — V is driver-sized by contract); scoring is explode →
    * BROADCAST join → per-doc average whose partial aggregation
    * collapses each partition's word rows to one row per doc before the
    * shuffle. The reference corpus is never joined shuffle-side.
    * Output: (idCol, n_words, lm_score), score = mean -ln p(w) rounded
    * to 4dp. */
  def lmScore(docs: DataFrame, reference: DataFrame, vocabSize: Int = 50000,
              idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val (counts, total) = wordCounts(reference, textCol)
    val probs = counts
      .orderBy(col("n").desc, col("word").asc)
      .limit(vocabSize)
      .select(col("word"), log(col("n").cast("double") / total).as("logp"))
    val floor = math.log(1.0 / total)
    docs.select(col(idCol),
        explode(split(TextAnalysis.normalized(col(textCol)), " "))
          .as("word"))
      .join(broadcast(probs), Seq("word"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        round(avg(-coalesce(col("logp"), lit(floor))), 4).as("lm_score"))
  }

  /** Interpolated BIGRAM LM quality score — the model-degree step from
    * [[lmScore]] toward CCNet's real n-gram scorer, still fully
    * declarative: P(wᵢ|wᵢ₋₁) = λ·P_bi + (1−λ)·P_uni, the first word of
    * each document scoring unigram-only, OOV at the 1/total floor, and
    * an unseen bigram backing off to the interpolation's unigram term.
    *
    * Scale shape: the reference corpus is scanned twice (unigram pass,
    * bigram pass), each one explode/hash-groupBy with map-side combine;
    * the probability tables are CAPPED (top `vocabSize` unigrams, top
    * `bigramSize` bigrams — count desc then lexicographic, so the cut is
    * deterministic) and BROADCAST — the scored corpus never shuffles for
    * the model, only for its own per-doc aggregation, whose partial
    * aggregation collapses word rows map-side. Bigram probabilities are
    * conditioned on the FULL unigram count of the left word (not the
    * capped table), so a capped vocabulary never inflates P_bi.
    * Output: (idCol, n_words, lm_bi_score = mean −ln p, 4dp). */
  def lmScoreBigram(docs: DataFrame, reference: DataFrame,
                    vocabSize: Int = 50000, bigramSize: Int = 200000,
                    lambda: Double = 0.7,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    val (counts, total) = wordCounts(reference, textCol)
    val uniProbs = counts
      .orderBy(col("n").desc, col("word").asc)
      .limit(vocabSize)
      .select(col("word").as("cur"),
        (col("n").cast("double") / total).as("p_uni"))
    val floorP = 1.0 / total

    def wordArrays(df: DataFrame, cols: Seq[Column]): DataFrame =
      df.select(cols :+
        filter(split(TextAnalysis.normalized(col(textCol)), " "),
          w => length(w) > 0).as("ws"): _*)
    def pairsOf(ws: Column): Column =
      zip_with(slice(ws, lit(1), size(ws) - 1),
        slice(ws, lit(2), size(ws) - 1),
        (p, c) => struct(p.as("prev"), c.as("cur")))

    val refPairs = wordArrays(reference, Seq.empty)
      .filter(size(col("ws")) >= 2)
      .select(explode(pairsOf(col("ws"))).as("pr"))
      .select(col("pr.prev"), col("pr.cur"))
    val bigProbs = graft.core.Checkpoints.cut(
      refPairs.groupBy("prev", "cur").agg(count(lit(1)).as("nb")))
      .join(counts.select(col("word").as("prev"), col("n").as("np")),
        "prev")
      .orderBy(col("nb").desc, col("prev").asc, col("cur").asc)
      .limit(bigramSize)
      .select(col("prev"), col("cur"),
        (col("nb").cast("double") / col("np").cast("double")).as("p_bi"))

    val dw = wordArrays(docs, Seq(col(idCol))).filter(size(col("ws")) > 0)
    val firsts = dw.select(col(idCol),
      lit(null).cast("string").as("prev"),
      element_at(col("ws"), 1).as("cur"))
    val rest = dw.filter(size(col("ws")) >= 2)
      .select(col(idCol), explode(pairsOf(col("ws"))).as("pr"))
      .select(col(idCol), col("pr.prev"), col("pr.cur"))
    firsts.unionByName(rest)
      .join(broadcast(uniProbs), Seq("cur"), "left")
      .join(broadcast(bigProbs), Seq("prev", "cur"), "left")
      .withColumn("p",
        when(col("prev").isNull, coalesce(col("p_uni"), lit(floorP)))
          .otherwise(lit(lambda) * coalesce(col("p_bi"), lit(0.0)) +
            lit(1.0 - lambda) * coalesce(col("p_uni"), lit(floorP))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        round(avg(-log(col("p"))), 4).as("lm_bi_score"))
  }

  /** Normalized word counts + grand total of a corpus — the shared first
    * pass of [[lmScore]] and [[vocabulary]] (one explode + hash-groupBy
    * with map-side combine, lineage-cut at vocabulary size so the total
    * and any top-V cut read the counts, not the corpus). The tokenization
    * here IS the vocabulary contract — one place to change it. Total is
    * clamped to ≥ 1 so an empty corpus yields empty results, not a
    * NULL-sum NPE or division by zero. */
  private def wordCounts(df: DataFrame, textCol: String)
      : (DataFrame, Double) = {
    val words = df.select(
      explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("word"))
    val counts = graft.core.Checkpoints.cut(
      words.groupBy("word").agg(count(lit(1)).as("n")))
    val row = counts.agg(sum("n")).collect().head
    val total = if (row.isNullAt(0)) 1.0 else row.getLong(0).toDouble
    (counts, total)
  }

  /** Quantile-band filter (the CCNet head/middle/tail selection step:
    * keep the middle of a quality/perplexity distribution, dropping both
    * the suspicious best and the junk worst): rows whose score lies in
    * the [lo, hi] quantile band survive.
    *
    * Scale shape: thresholds come from ONE `percentile_approx` sketch
    * pass — a mergeable map-side-combinable aggregate with a rank-error
    * guarantee of 1/`accuracy`, never a global sort — and are then
    * broadcast as literals into a narrow filter, so the second pass
    * pushes the band predicate down to the scan. The exact-percentile
    * alternative materializes a full sort (or an all-values aggregation
    * buffer) — the sketch is the 100 TB path, and the gate bounds its
    * error against exact quantiles. */
  def quantileBand(df: DataFrame, score: Column, lo: Double, hi: Double,
                   accuracy: Int = 10000): DataFrame = {
    require(0.0 <= lo && lo < hi && hi <= 1.0,
      s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val s = score.cast("double")
    val row = df.agg(percentile_approx(s, array(lit(lo), lit(hi)),
      lit(accuracy)).as("t")).collect().head
    // empty / all-NULL-score input: no quantiles exist, the band is empty
    // (not an NPE three calls later)
    if (row.isNullAt(0)) df.filter(lit(false))
    else {
      val t = row.getSeq[Double](0)
      df.filter(s >= t(0) && s <= t(1))
    }
  }

  /** Vocabulary builder (tokenizer-training prep): the `topV` most
    * frequent words of the corpus under the same normalization
    * [[lmScore]] uses, with per-word probability and cumulative coverage
    * — the curve that picks a vocab size ("top 32k words cover 97.1%").
    *
    * Scale shape: one explode + hash-groupBy with map-side combine over
    * the corpus (the only corpus-sized pass), lineage-cut at vocabulary
    * size; the top-V cut is a TakeOrdered; the rank/coverage window runs
    * over the V surviving rows only — V is driver-sized by contract
    * (same contract as [[lmScore]]'s broadcast vocabulary), so the
    * single-partition window is bounded, never corpus-sized.
    * Output: (rank 1..V, word, n, p, coverage), p/coverage rounded 6dp. */
  def vocabulary(docs: DataFrame, topV: Int,
                 textCol: String = "text"): DataFrame = {
    require(topV > 0, s"topV must be positive, got $topV")
    val (counts, total) = wordCounts(docs, textCol)
    val byFreq = Window.orderBy(col("n").desc, col("word").asc)
    counts
      .orderBy(col("n").desc, col("word").asc)
      .limit(topV)
      .select(row_number().over(byFreq).cast("long").as("rank"),
        col("word"), col("n"),
        round(col("n") / total, 6).as("p"),
        round(sum(col("n")).over(
          byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          / total, 6).as("coverage"))
  }

  /** Per-source document cap (the domain-cap curation step: without it a
    * handful of hot domains dominates a web-scale mixture): keep at most
    * `k` documents per source, best-first by (score desc, id asc).
    *
    * Scale shape: the per-source top-k is the bounded native
    * [[graft.functions.TopKRowsAgg]] aggregate — ObjectHashAggregate
    * with map-side partials capped at k, so even the hottest source
    * reduces to ≤ k rows per input task before the shuffle. The obvious
    * `row_number().over(Window.partitionBy(source))` would instead
    * funnel EVERY row of the hottest domain through the one task that
    * owns its partition key. (The original typed-udaf heap here paid a
    * per-row encoder round-trip — the Similarity.topKPerQuery probe
    * measured that at ~60× the native aggregate on a hot stream.)
    * Ties break (score desc, id asc), matching the SQL `row_number`
    * oracle — encoded as the ascending order of `struct(−score, id)`,
    * with IEEE negation keeping values exact. Rows with a NULL id or
    * NULL score are EXCLUDED (an unscored document can't be ranked) —
    * the oracle must carry the same `IS NOT NULL` guards.
    * Output: (sourceCol, rank 1..k, idCol, score). */
  def capPerSource(df: DataFrame, k: Int, score: Column,
                   sourceCol: String = "source",
                   idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    df.select(col(sourceCol), col(idCol), score.cast("double").as("score"))
      .filter(col(idCol).isNotNull && col("score").isNotNull)
      .groupBy(sourceCol)
      .agg(graft.functions.TopKRows.topKStructs(
        struct((-col("score")).as("ns"), col(idCol).as("id")), k)
        .as("hits"))
      .select(col(sourceCol), posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col(sourceCol), (col("pos") + 1).cast("long").as("rank"),
        col("h.id").as(idCol), (-col("h.ns")).as("score"))
  }

  /** Deterministic token masking — masked/denoising-objective
    * preparation (BERT/T5-style): each word of the normalized text is
    * independently replaced by `maskToken` with probability `rate`,
    * where the coin is the salted md5 of (id, position) — the SAME
    * recipe as every other deterministic draw here, so masks reproduce
    * across runs, partitionings, and dataset versions, and a (doc, pos)
    * draw is independent of every other consumer's draws.
    *
    * Scale shape: pure narrow projection — split, per-position lambda,
    * re-join; no shuffle, no state, no RNG to seed per task. Output:
    * (idCol, masked_text, n_tokens, n_masked). */
  def maskTokens(docs: DataFrame, rate: Double, maskToken: String = "<mask>",
                 seed: String = "mask", idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate in [0,1], got $rate")
    val words = filter(split(TextAnalysis.normalized(col(textCol)), " "),
      w => length(w) > 0)
    val draw = (i: Column) => hashUniform(
      concat(col(idCol).cast("string"), lit(":"), i.cast("string")), seed)
    docs
      // the size guard matters twice: sequence(1, 0) would DESCEND, and
      // zip_with pads the shorter side with nulls — an empty doc would
      // otherwise grow one phantom (possibly masked) token
      .withColumn("__masked", when(size(words) > 0,
        zip_with(words, sequence(lit(1), size(words)),
          (w, i) => when(draw(i) < rate, lit(maskToken)).otherwise(w)))
        .otherwise(array().cast("array<string>")))
      .select(col(idCol),
        concat_ws(" ", col("__masked")).as("masked_text"),
        size(col("__masked")).cast("long").as("n_tokens"),
        size(filter(col("__masked"), w => w === maskToken))
          .cast("long").as("n_masked"))
  }

  /** Deterministic uniform sample of k rows per key — the "give me 100
    * random docs per domain" inspection/eval draw that must reproduce
    * across runs and dataset versions (a re-crawled doc keeps its draw,
    * so sampled eval sets stay stable). The draw order is the salted
    * md5 of the id ([[saltedHex]] — same recipe as every other
    * deterministic draw here), smallest first, id tie-break.
    *
    * Scale shape: reuses the bounded-heap top-k aggregator
    * ([[capPerSource]]'s shape) — map-side partials of ≤ k rows per
    * key, no per-key window funnel over the full corpus. Output:
    * (keyCol, rank 1..k, idCol). */
  def samplePerKey(df: DataFrame, k: Int, keyCol: String = "source",
                   idCol: String = "doc_id",
                   seed: String = "sample"): DataFrame =
    capPerSource(df, k,
      score = -hexDraw(saltedHex(col(idCol), seed)).cast("double"),
      sourceCol = keyCol, idCol = idCol)
      .drop("score")

  /** Weighted sampling WITHOUT replacement via priority sampling
    * (Duffield, Lund & Thorup, "Priority Sampling for Estimation of
    * Arbitrary Subset Sums", JACM 54(6) 2007): each row draws the
    * deterministic uniform `u = draw/10⁶ ∈ (0, 1]` from the one salted
    * md5 recipe ([[saltedHex]]) and gets priority `q = w/u`; the k
    * largest priorities form the sample. Selection probability rises
    * with weight, no row repeats, and the whole draw is a pure function
    * of (id, salt) — reproducible across runs and dataset versions, the
    * [[hashSplit]] leakage-free property. This is the mixture-sampling
    * primitive for "sample 1M docs proportional to quality score".
    *
    * Exactness: priority is ONE IEEE multiply + divide over the exact
    * double weight and the integer draw (`w·10⁶ / draw`) — identical
    * bits in any IEEE-754 engine, so the selected SET matches the SQL
    * oracle row-for-row (no `ln`, whose libm rounding may differ across
    * engines — why this is priority sampling and not A-ES exponential
    * keys). Fractional weights are first-class (quality scores live in
    * (0, 1]); ties break by id.
    *
    * Scale shape: narrow draw + global top-k = TakeOrderedAndProject
    * (per-partition bounded heap, driver merges k rows) — no full sort,
    * no shuffle of the corpus. Fails fast on non-positive/NaN weights
    * (a silent zero/negative weight corrupts the estimator, the
    * weighted-PageRank posture). Output: (idCol, w, draw) of the k
    * selected rows. */
  def prioritySample(df: DataFrame, k: Int, weight: Column,
                     idCol: String = "doc_id",
                     salt: String = "priority"): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val w = when(weight.cast("double") > 0.0, weight.cast("double"))
      .otherwise(raise_error(concat(
        lit("prioritySample: weight must be positive, got "),
        coalesce(weight.cast("string"), lit("null")))))
    df.select(col(idCol), w.as("w"),
      (pmod(hexDraw(saltedHex(col(idCol), salt)), lit(1000000L)) + 1L)
        .as("draw"))
      .orderBy((col("w") * 1000000.0 / col("draw")).desc, col(idCol))
      .limit(k)
  }

  /** Deterministic UNIFORM k-sample PER GROUP — the per-domain /
    * per-source subsampling step a mixing pipeline runs before heavier
    * scoring ("inspect 1000 random docs from every domain", "cap the
    * eyeball sample per language"). Each row draws the md5-hash value
    * [[hexDraw]] of its (id, salt) — same id, same draw in every run,
    * partitioning and engine independent (the [[prioritySample]] draw
    * discipline, unweighted) — and the k smallest draws per group win,
    * ties broken by id.
    *
    * Scale shape: [[Rank.topKPerGroup]]'s bounded-heap aggregate — ONE
    * ObjectHashAggregate with map-side partial pruning to ≤ k rows per
    * group per task; the exchange carries `groups × k` rows, never the
    * corpus (the window/row_number form this replaces funnels every row
    * of a group through one task). Output: input columns + `draw`. */
  def groupSample(df: DataFrame, keys: Seq[String], k: Int,
                  idCol: String = "doc_id",
                  salt: String = "group-sample"): DataFrame = {
    require(keys.nonEmpty, "groupSample needs at least one group column")
    require(k > 0, s"sample size must be positive, got $k")
    Rank.topKPerGroup(
      df.withColumn("draw", hexDraw(saltedHex(col(idCol), salt))),
      keys, Seq("draw", idCol), k)
  }

  /** Deterministic global shuffle into shards (the pre-training shuffle:
    * trainers need the corpus in a reproducible pseudo-random order that
    * any re-run, resume, or re-shard reproduces exactly): each row's
    * shard and its position within the shard are pure functions of
    * (id, seed) via the md5 draw — no `rand()`, no partitioning
    * dependence.
    *
    * Scale shape: shard assignment is narrow; the within-shard ordering
    * is a window PARTITIONED BY shard (range partition + local sort per
    * shard, the [[packSequences]] shape) — never a global
    * single-partition sort. Output: (idCol, shard, pos 1..). */
  def shuffleShards(df: DataFrame, shards: Int, seed: String = "shuffle",
                    idCol: String = "doc_id"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window.partitionBy("shard").orderBy(col("hx"), col(idCol))
    df.select(col(idCol), saltedHex(col(idCol), seed).as("hx"))
      .withColumn("shard", pmod(hexDraw(col("hx")), lit(shards.toLong)))
      .select(col(idCol), col("shard"),
        row_number().over(w).cast("long").as("pos"))
  }

  /** Greedy contiguous sequence packing: documents are sharded by id,
    * ordered within each shard, and assigned to fixed-token-budget bins
    * by exclusive prefix sum — bin = floor(tokens_before / budget). The
    * window partitions by shard, so the sort is per-shard (range
    * partition + local sort), never a single-partition global window; at
    * 100 TB each shard packs independently, exactly how production
    * packers shard the work. A document longer than the budget keeps the
    * packing contiguous (it spans its bin's budget and the next bin
    * starts after it) rather than being split — token-level splitting is
    * the tokenizer's job downstream.
    * Output: (idCol, shard, bin, n_tokens). */
  def packSequences(docs: DataFrame, budgetTokens: Int, shards: Int = 64,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0 && shards > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
    docs.select(col(idCol),
        pmod(col(idCol), lit(shards.toLong)).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      // integer `div`, never a double round-trip: the bin index stays
      // bit-exact at any cum magnitude (doubles lose exactness past 2^53)
      .withColumn("bin", expr(s"(cum - n_tokens) div ${budgetTokens}L"))
      .select(col(idCol), col("shard"), col("bin"), col("n_tokens"))
  }

  /** MATERIALIZED packing — the training rows themselves, not just the
    * assignment: each (shard, bin) row carries the concatenated BPE token
    * stream of its documents in id order, which is what a loader feeds
    * the trainer. Same shard/prefix-sum discipline as [[packSequences]]
    * (per-shard window, no global sort), on top of [[Bpe.encode]]'s
    * ordered per-document streams; the bin assembly is one
    * sort-under-aggregation per (shard, bin) — flatten of id-sorted
    * (id, tokens) structs, so the stream order is deterministic under any
    * partitioning. Output: (shard, bin, doc_ids, tokens, n_tokens).
    *
    * At 100 TB each shard packs independently (the window partitions by
    * shard) and a bin's row is loader-sized by construction (~budget
    * tokens, the long-document overshoot contract of [[packSequences]]).
    */
  def packTokens(docs: DataFrame, merges: Seq[(String, String)],
                 budgetTokens: Int, shards: Int = 64,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0 && shards > 0)
    val w = Window.partitionBy("shard").orderBy(idCol)
    Bpe.encode(docs, merges, idCol, textCol)
      .select(col(idCol), pmod(col(idCol), lit(shards.toLong)).as("shard"),
        col("tokens"), col("n_bpe_tokens").as("n"))
      .withColumn("cum", sum("n").over(w))
      // same integer `div` discipline as [[packSequences]]
      .withColumn("bin", expr(s"(cum - n) div ${budgetTokens}L"))
      .groupBy("shard", "bin")
      .agg(
        sort_array(collect_list(struct(col(idCol).as("id"), col("tokens"))))
          .as("packed"),
        sum(col("n")).as("n_tokens"))
      .select(col("shard"), col("bin"),
        col("packed.id").as("doc_ids"),
        flatten(col("packed.tokens")).as("tokens"),
        col("n_tokens"))
  }
}
