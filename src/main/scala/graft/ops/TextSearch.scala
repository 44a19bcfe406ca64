package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text relevance ranking over a document corpus — the retrieval
  * face of the text layer (used for corpus exploration, eval-set mining,
  * and quality-by-query auditing in training-data pipelines):
  *
  *  - [[bm25]]: Okapi BM25 (Robertson & Walker, SIGIR 1994; the TREC-3
  *    formulation with the standard k1/b parameterization) over the same
  *    whitespace token stream the rest of the text layer uses
  *    ([[TextAnalysis.normalized]]), so a scored document is scored on
  *    exactly the words dedup and LM-scoring saw.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the query-term filter is an `isin` over a driver-sized literal list,
  *    applied BEFORE any shuffle — non-matching words never leave the
  *    scan's partitions, so the term-frequency groupBy shuffles only
  *    (doc, query-term) rows, map-side combined;
  *  - document frequencies are a second-level aggregation over that tiny
  *    tf frame (≤ |terms| rows out), never a second corpus scan;
  *  - per-term idf weights join back as a BROADCAST of ≤ |terms| rows;
  *  - corpus stats (N, avgdl) are one column-pruned scalar aggregation
  *    (two longs to the driver — the same posture as lmScore's
  *    vocabulary total), not a per-row join input.
  */
object TextSearch {

  /** BM25 scores for every document matching at least one query term.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the non-negative
    * Lucene-style idf.
    *
    * `dl` is the document's whitespace token count over the normalized
    * text; `avgdl` its corpus mean. Deterministic and oracle-exact: every
    * input to the formula (tf, df, dl, N, avgdl) is integer-derived, so
    * the 4-dp rounded score is engine-independent.
    *
    * Output: (idCol, n_terms_hit, bm25), one row per matching document. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val dl: Column = size(split(TextAnalysis.normalized(col(textCol)), " "))
    // one corpus pass: per-doc length + the query-term token stream
    val hits = docs
      .select(col(idCol).as("id"), dl.cast("long").as("dl"),
        explode(split(TextAnalysis.normalized(col(textCol)), " ")).as("word"))
      .filter(col("word").isin(terms: _*))
      .groupBy("id", "dl", "word")
      .agg(count(lit(1)).as("tf"))
    // corpus stats are dimension-sized scalars (two longs) by contract —
    // the same driver-side posture as lmScore's vocabulary total
    val stats = docs.agg(count(lit(1)).as("n"), sum(dl).as("toks"))
      .collect().head
    val n = stats.getLong(0).toDouble
    val avgdl = stats.getLong(1).toDouble / n
    // document frequencies: second-level aggregate over the tf frame
    // (≤ |terms| rows out), broadcast back as the idf dimension
    val idf = hits.groupBy("word")
      .agg(count(lit(1)).as("df"))
      .select(col("word"),
        log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
          .as("idf"))
    val perTerm = hits.join(broadcast(idf), "word")
      .select(col("id"),
        (col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
          .as("s"))
    perTerm.groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), round(sum("s"), 4).as("bm25"))
      .select(col("id").as(idCol), col("n_terms_hit"), col("bm25"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the standard way to combine heterogeneous retrieval lists (BM25 +
    * embedding ANN = "hybrid search", or any mix of rankers) without
    * score calibration: each list contributes 1/(k + rank) per document,
    * summed. Rank-based, so incomparable score scales fuse cleanly; the
    * constant k (=60 in the paper) damps the head.
    *
    * Each input frame is one ranked list: (queryCol, idCol, scoreCol),
    * ranked per query by (score desc, id asc) — the deterministic
    * tie-break every ranked operator in this repo uses. Scale shape:
    * input lists are RETRIEVAL OUTPUTS, per-query-bounded by
    * construction (a top-k operator emitted them), so the per-query
    * row_number windows run over candidate lists, never a corpus; the
    * fusion itself is one hash-aggregation on (query, id).
    * Output: (queryCol, idCol, n_lists, rrf). */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 60,
              queryCol: String = "query_id", idCol: String = "id",
              scoreCol: String = "score"): DataFrame = {
    require(lists.nonEmpty, "nothing to fuse")
    require(k >= 0, s"rrf constant must be non-negative, got $k")
    val w = Window.partitionBy(queryCol)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    lists
      .map(_.select(col(queryCol), col(idCol),
        row_number().over(w).as("rank")))
      .reduce(_ unionByName _)
      .groupBy(queryCol, idCol)
      .agg(count(lit(1)).as("n_lists"),
        sum(lit(1.0) / (lit(k) + col("rank"))).as("rrf"))
  }

  /** All-pairs document cosine similarity over COUNT vectors (the sparse
    * lexical twin of the embedding near-dup family): every document pair
    * whose term-frequency-vector cosine meets a rational threshold
    * `num/den`. The integer-exact formulation is deliberate —
    * cos(a,b) ≥ num/den  ⇔  den²·dot² ≥ num²·‖a‖²·‖b‖² — every quantity
    * (dot, squared norms) is an integer, so the pair set AND the emitted
    * measures are bit-identical in any engine; no float summation order
    * anywhere.
    *
    * The vector space is the words with document frequency ≤ `dfCap`:
    * ultra-common terms are dropped BEFORE the pair join — the standard
    * inverted-index prune (cf. DIMSUM / all-pairs similarity search,
    * Zadeh & Goel 2012) that bounds per-word join fan-out to dfCap² and
    * is what keeps the operator sub-quadratic at corpus scale. The cap
    * defines the similarity measure (norms use the same capped space),
    * so results are self-consistent, and completeness within that space
    * is exact: a pair with cosine > 0 shares ≥ 1 surviving word and is
    * generated by the postings self-join.
    *
    * Scale shape: one corpus tokenization pass → (word, doc, tf)
    * postings; the df prune is a semi-join against the word-frequency
    * aggregate of the SAME frame (no second scan); candidate pairs meet
    * by equi-join on the word; one hash-aggregation folds shared words
    * into the dot product. Never all-pairs, never a cross join.
    *
    * `ngram` sets the term unit: 1 = single words; n > 1 = word n-grams
    * (shingles), the right unit when the vocabulary is small relative to
    * the corpus — n-gram spaces are sparse, so document frequencies stay
    * low and the dfCap prune keeps real signal instead of gutting the
    * space. Documents shorter than `ngram` words contribute no terms
    * (empty vectors never pair).
    *
    * Output: (d1, d2, dot, n1sq, n2sq), d1 < d2, all longs.
    *
    * `materialize = true` (default) persists the pruned postings across
    * their three consumers (norms + both join sides), materializes the
    * result and releases the cache before returning — the
    * PageRank/Triangles cache discipline. `false` returns the
    * un-materialized composable plan (the postings subtree is then
    * evaluated once per consumer). */
  def cosinePairs(docs: DataFrame, num: Long, den: Long, dfCap: Long,
                  ngram: Int = 1, idCol: String = "doc_id",
                  textCol: String = "text",
                  materialize: Boolean = true): DataFrame = {
    require(den > 0 && num > 0, s"threshold must be positive, got $num/$den")
    require(num <= den, s"cosine threshold must be <= 1, got $num/$den")
    require(dfCap >= 2, s"dfCap below 2 generates no pairs, got $dfCap")
    require(ngram >= 1, s"ngram must be >= 1, got $ngram")
    // stage the tokenized array in its OWN projection before the explode:
    // a complex generator child (regex normalize + split under the n-gram
    // transform) measured ~7× slower than generating from a materialized
    // array column — keep the Generate's input a bare attribute
    val ws = col("__ws")
    val terms: Column =
      if (ngram == 1) ws
      else when(size(ws) >= ngram,
        transform(sequence(lit(1), size(ws) - (ngram - 1)),
          i => concat_ws(" ", slice(ws, i, lit(ngram)))))
        .otherwise(array().cast("array<string>"))
    val postings = docs
      .select(col(idCol).as("id"),
        split(TextAnalysis.normalized(col(textCol)), " ").as("__ws"))
      .select(col("id"), explode(terms).as("w"))
      .groupBy("w", "id").agg(count(lit(1)).as("tf"))
    val pruned = postings.join(
      postings.groupBy("w").agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap).select("w"),
      Seq("w"), "left_semi")
    val kept = if (materialize) pruned.persist() else pruned
    val norms = kept.groupBy("id")
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val a = kept.select(col("w"), col("id").as("d1"), col("tf").as("tf1"))
    val b = kept.select(col("w"), col("id").as("d2"), col("tf").as("tf2"))
    val dots = a.join(b, Seq("w"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(sum(col("tf1") * col("tf2")).as("dot"))
    val out = dots
      .join(norms.select(col("id").as("d1"), col("n2").as("n1sq")), Seq("d1"))
      .join(norms.select(col("id").as("d2"), col("n2").as("n2sq")), Seq("d2"))
      .filter(lit(den * den) * col("dot") * col("dot") >=
        lit(num * num) * col("n1sq") * col("n2sq"))
      .select(col("d1"), col("d2"), col("dot"), col("n1sq"), col("n2sq"))
    if (!materialize) out
    else {
      val materialized = graft.core.Checkpoints.cut(out)
      kept.unpersist()
      materialized
    }
  }

  // --- Persisted incremental BM25 posting index -------------------------

  /** Term-hash partition count of the persisted posting layout: postings
    * land under `wp = pmod(xxhash64(word), NP)` directories, so a query
    * for a handful of terms prunes its scan to the terms' own partitions
    * (the MinHash band-index `bp` discipline applied to search). */
  private[graft] val PostingPartitions = 64

  private[graft] def postingsPath(indexPath: String) = s"$indexPath/postings"
  private[graft] def docLenPath(indexPath: String) = s"$indexPath/doclen"

  /** One corpus pass → the full posting rows `(word, id, tf, dl, wp)`.
    * `dl` rides every posting so scoring needs no doc-length join; the
    * tokenized array stages in its own projection before the explode
    * (the measured generator-child discipline). */
  private def postingRows(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        split(TextAnalysis.normalized(col(textCol)), " ").as("__ws"))
      .select(col("id"), size(col("__ws")).cast("long").as("dl"),
        explode(col("__ws")).as("word"))
      .groupBy("word", "id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("wp",
        pmod(xxhash64(col("word")), lit(PostingPartitions.toLong)))

  /** Land the batch's two index layouts: postings (term-hash
    * partitioned) FIRST, then doc lengths `(id, dl)` — doclen is the
    * membership AND stats authority (the probe-before-append anti-join
    * tests it, and [[readStats]] aggregates it), so a doc counted as
    * indexed always has its postings on disk. The converse crash window
    * (postings landed, doclen lost) makes the replay re-append those
    * docs' postings — the only duplicate class, healed exactly at read:
    * duplicate posting rows carry identical (tf, dl) for the same
    * (word, id), so the query face's dropDuplicates keeps the true row.
    * A crashed ad-hoc append must be re-run to land doclen (streaming
    * replay does this by construction). */
  private def landBatch(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, fresh: DataFrame,
                        idCol: String, textCol: String): Long = {
    val staged = fresh.persist()
    try {
      val nNew = staged.count()
      if (nNew > 0) {
        postingRows(staged, idCol, textCol)
          .write.mode("append").partitionBy("wp")
          .parquet(postingsPath(indexPath))
        val dl = size(split(TextAnalysis.normalized(col(textCol)), " "))
          .cast("long")
        staged.select(col(idCol).as("id"), dl.as("dl"))
          .write.mode("append").parquet(docLenPath(indexPath))
      }
      nNew
    } finally { staged.unpersist(); () }
  }

  /** Build the persisted BM25 index of a corpus snapshot (overwrite).
    * Single-writer; a crash mid-build means re-run. */
  def writeBm25Index(spark: org.apache.spark.sql.SparkSession,
                     docs: DataFrame, indexPath: String,
                     idCol: String = "doc_id",
                     textCol: String = "text"): Long = {
    graft.core.Fs.delete(spark, indexPath)
    landBatch(spark, indexPath, docs, idCol, textCol)
  }

  /** Fold a batch into the index with the probe-before-append
    * discipline: docs whose id the doclen layout already holds are
    * skipped (ONE anti-join against the narrow `(id, dl)` layout — the
    * fingerprint-index posture), so re-crawled or replayed content
    * never double-counts df/tf/stats. Returns the number of
    * newly-indexed documents. */
  def appendBm25Index(spark: org.apache.spark.sql.SparkSession,
                      indexPath: String, batch: DataFrame,
                      idCol: String = "doc_id",
                      textCol: String = "text"): Long = {
    val fresh =
      if (graft.core.Fs.exists(spark, docLenPath(indexPath)))
        batch.join(spark.read.parquet(docLenPath(indexPath))
            .select(col("id").as(idCol)),
          Seq(idCol), "left_anti")
      else batch
    landBatch(spark, indexPath, fresh, idCol, textCol)
  }

  /** Corpus totals (N docs, Σ doc length) aggregated from the doclen
    * layout — the membership authority, so totals can never drift from
    * membership under any crash window. One column-pruned map-side-
    * combined aggregation over a two-long-column layout (16 bytes/doc;
    * ~16 GB at 10⁹ docs — the same narrow-scan class as the
    * fingerprint-index probe the exact-dedup chain pays per batch). */
  private[graft] def readStats(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String): (Long, Long) = {
    val r = spark.read.parquet(docLenPath(indexPath))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head
    (r.getLong(0), r.getLong(1))
  }

  /** [[bm25]] served FROM the persisted index — the corpus is never
    * touched: the posting scan prunes to the query terms' `wp`
    * partitions (PartitionFilters — plan-pinned by Bm25IndexSpec), df
    * aggregates over those collided rows, and corpus totals aggregate
    * from the narrow doclen layout. Same formula, same integer inputs
    * (tf, df, dl,
    * N, Σdl), same 4-dp round — value-identical to scoring the corpus
    * directly ([[bm25]]), so the two faces share one oracle.
    *
    * Scale shape: a query moves |terms| partitions' posting rows — at a
    * 100 TB corpus that is the only surface whose size matters, and it
    * scales with term document frequency, not corpus file count. */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession,
                    indexPath: String, terms: Seq[String],
                    k1: Double = 1.2, b: Double = 0.75,
                    idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "empty query")
    // the terms' wp values via the engine's own hash (a driver-sized
    // local-relation job — guaranteed parity with the layout writer)
    import spark.implicits._
    val wps = terms.toDF("word")
      .select(pmod(xxhash64(col("word")), lit(PostingPartitions.toLong)))
      .as[Long].collect().distinct.sorted
    val (n0, toks) = readStats(spark, indexPath)
    val n = n0.toDouble
    val avgdl = toks.toDouble / n
    val hits = spark.read.parquet(postingsPath(indexPath))
      .filter(col("wp").isin(wps.toIndexedSeq: _*) &&
        col("word").isin(terms: _*))
      .select(col("id"), col("dl"), col("word"), col("tf"))
      // crash-replay duplicates carry identical content (landBatch
      // note); drop on the key — query-term-sized shuffle only
      .dropDuplicates("word", "id")
    val idf = hits.groupBy("word")
      .agg(count(lit(1)).as("df"))
      .select(col("word"),
        log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5))
          .as("idf"))
    val perTerm = hits.join(broadcast(idf), "word")
      .select(col("id"),
        (col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
          .as("s"))
    perTerm.groupBy("id")
      .agg(count(lit(1)).as("n_terms_hit"), round(sum("s"), 4).as("bm25"))
      .select(col("id").as(idCol), col("n_terms_hit"), col("bm25"))
  }
}
