package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design (100 TB): nothing here is all-pairs. Exact dedup is one
  * hash-groupBy; near-dup goes through an inverted index (explode shingles →
  * equi-join on shingle / MinHash band bucket) so candidate generation is a
  * shuffle on a key, never a cartesian product. Candidate verification
  * (exact Jaccard) runs only on bucket-cohabiting pairs.
  */
object Dedup {

  /** Exact dedup via content fingerprint: one row per distinct normalized
    * text, keeping the smallest id as survivor.
    * Output: (fingerprint, survivor_id, n_copies). One shuffle. */
  def exactSurvivors(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"),
        col(idCol))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("survivor_id"),
        count(lit(1)).as("n_copies"))

  /** Exact-dup survivor selection with a POLICY: per duplicate cluster
    * keep the row MAXIMIZING a caller-supplied score (quality signal,
    * length, recency), smallest id on ties — "keep the best copy"
    * instead of [[exactSurvivors]]'s "keep the first copy". One
    * hash-groupBy with an orderable-struct max: map-side combinable, no
    * window, no second pass. */
  def exactSurvivorsBy(docs: DataFrame, score: Column,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    docs.select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"),
        col(idCol).cast("long").as("id"), score.cast("double").as("score"))
      .groupBy("fingerprint")
      .agg(max(struct(col("score"), (-col("id")).as("neg_id"))).as("best"),
        count(lit(1)).as("n_copies"))
      .select(col("fingerprint"), (-col("best.neg_id")).as("survivor_id"),
        col("best.score").as("score"), col("n_copies"))

  /** (id, shingles) staging frame: sorted distinct word n-gram shingles.
    *
    * Repartitioned by id ONLY when the scan is under-parallel (fewer
    * partitions than the cluster's default parallelism): a single-file
    * parquet corpus arrives as one partition, which would serialize the
    * shingle evaluation onto one core — but a 100 TB corpus already scans
    * with thousands of partitions, and an unconditional repartition there
    * is a full-corpus shuffle bought for nothing. */
  def shingled(docs: DataFrame, n: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val floor = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < floor) docs.repartition(col(idCol))
      else docs
    spread.select(col(idCol).as("id"),
      TextAnalysis.wordShingleHashes(col(textCol), n).as("shingles"))
  }

  /** Exact n-gram-Jaccard near-dup pairs via a document-frequency-capped
    * inverted shingle index.
    *
    * Candidate generation: explode shingles → group by shingle → emit
    * candidate pairs per posting list. Lists with 2..maxDF documents emit
    * all C(k,2) id pairs; HOT lists (> maxDF documents — boilerplate
    * shingles, but also mass-duplicated templates) emit each member
    * paired against ONE representative (the min id) — k-1 rows instead of
    * k², so no quadratic blowup and no skewed shuffle key, while a
    * mass-duplicate cluster still surfaces as a verified star around its
    * representative (every member has Jaccard ≈ 1 with the rep; the
    * cluster is recoverable as the rep's connected component). Only
    * non-rep pair structure WITHIN an over-cap cluster is elided — the
    * membership itself is never silently lost.
    * Verification: join the full shingle arrays back on the deduped
    * candidate pairs and compute EXACT Jaccard — every emitted pair is
    * exact. Output: (id_a, id_b, jaccard) with id_a < id_b. */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                   maxDF: Int = 1000,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // (id, shingles) materialized once: shared by the inverted index and
    // both sides of the verification join.
    val sh = Checkpoints.cut(shingled(docs, n, idCol, textCol))
    verifiedJaccard(invertedIndexCandidates(sh, maxDF), sh, threshold)
  }

  /** The df-capped inverted-index candidate generator shared by
    * [[jaccardPairs]] and [[containmentPairs]]: C(k,2) pairs for shingles
    * in 2..maxDF documents, a star around the min-id representative
    * above the cap (bounded, never all-pairs — rationale on
    * [[jaccardPairs]]).
    *
    * Two-pass so NO per-key state is ever df-sized (a stop-word-like
    * shingle in 10⁸ documents must not materialize one multi-GB buffer in
    * a single task — the skewed-key unbounded-state class):
    *  1. df + min-id per shingle via `count`/`min` — CONSTANT per-key
    *     state, map-side combinable.
    *  2a. shingles with df ≤ maxDF semi-join back into the posting rows,
    *      which SELF-JOIN on the shingle key (`id_a < id_b` as the pair
    *      orientation filter) — C(k,2) pairs with the join's per-key
    *      buffered group ≤ maxDF rows BY CONSTRUCTION (the same bound
    *      the earlier `collect_set` posting-list form had, minus the
    *      list: r14 measured the join form 21% faster at sf0.1 — the
    *      array build plus the interpreted nested-`transform` pair
    *      emission lost to one codegen'd join, identical pair set).
    *  2b. shingles with df > maxDF take the star via an equi-join against
    *      their pre-aggregated representative — k−1 rows, zero array
    *      state at ANY document frequency.
    * Emitted pair set is identical to the collect_set form (a sorted
    * posting list's C(k,2) enumeration IS the id_a < id_b self-join). */
  private[ops] def invertedIndexCandidates(sh: DataFrame,
                                           maxDF: Int): DataFrame =
    coCountedCandidates(sh, maxDF)._1.select("id_a", "id_b")

  /** [[invertedIndexCandidates]] with the generator's own evidence kept
    * instead of thrown away (r14): returns
    *
    *  1. candidate pairs `(id_a, id_b, c_cold)` where `c_cold` is the
    *     EXACT number of below-cap shingles the two documents share —
    *     the cold path emits one row per shared cold shingle, so the
    *     count that dedups the pair set IS that co-occurrence count
    *     (star/hot emissions contribute the pair but count 0: a hot
    *     emission does witness a shared shingle, but only rep-anchored
    *     ones, so counting them would make the bound's split ambiguous);
    *  2. per-document hot-shingle counts `(id, n_hot)` — how many of the
    *     document's shingles have df > maxDF (absent id ⇒ 0).
    *
    * Together they give an exact upper bound on ANY pair's true overlap:
    * `n_common ≤ c_cold + min(n_hot_a, n_hot_b)` — every shared shingle
    * is either below the cap (counted exactly by c_cold) or above it
    * (shared ⇒ in both documents' hot sets, so at most min(n_hot)).
    * [[containmentPairs]] prunes on this bound BEFORE touching the
    * shingle arrays. The aggregation replaces the old
    * `dropDuplicates` with a same-shuffle `sum` — identical pair set. */
  private[ops] def coCountedCandidates(sh: DataFrame,
                                       maxDF: Int): (DataFrame, DataFrame) = {
    val posts = sh.select(col("id"), explode(col("shingles")).as("shingle"))
    // Pass 1: (shingle, df, rep). Pure count/min — no collection state.
    val stats = posts.groupBy("shingle")
      .agg(count(lit(1)).as("df"), min(col("id")).as("rep"))
      .filter(col("df") >= 2)
    // Cold path: posting rows bounded by the semi-join prune, then the
    // pair set by equi-self-join — per-key join state ≤ maxDF rows.
    val coldIds = posts
      .join(stats.filter(col("df") <= maxDF).select("shingle"),
        Seq("shingle"), "left_semi")
    val coldPairs = coldIds.alias("a")
      .join(coldIds.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(struct(col("a.id").as("id_a"), col("b.id").as("id_b")).as("p"),
        lit(1L).as("cold"))
    // Hot path: star around the min id — equi-join, never a list.
    val hotShingles = stats.filter(col("df") > maxDF)
    val hotPairs = posts
      .join(hotShingles.select("shingle", "rep"), Seq("shingle"))
      .filter(col("id") =!= col("rep"))
      .select(struct(col("rep").as("id_a"), col("id").as("id_b")).as("p"),
        lit(0L).as("cold"))
    val pairs = coldPairs.union(hotPairs)
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(sum(col("cold")).as("c_cold"))
    val hotCounts = posts
      .join(hotShingles.select("shingle"), Seq("shingle"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hot"))
    (pairs, hotCounts)
  }

  /** Exact n-gram CONTAINMENT near-superset pairs — the dedup face
    * Jaccard misses: a document mostly CONTAINED in a longer one
    * (boilerplate-wrapped re-posts, crawl snapshots with appended
    * chrome, quoted-in-full replies) scores low resemblance (the union
    * is dominated by the longer side) but containment ≈ 1. Broder's
    * distinction (Broder, "On the resemblance and containment of
    * documents", SEQUENCES 1997): resemblance |A∩B|/|A∪B| vs
    * containment |A∩B|/|A|. Training pipelines prune these as
    * aggressively as near-dups — the contained side adds no novel text.
    *
    * Same df-capped inverted-index candidate generation and exact
    * verification discipline as [[jaccardPairs]] (bounded, never
    * all-pairs; every emitted pair exact). CAP RECALL CAVEAT, sharper
    * here than for resemblance: above-cap shingles collapse to a star
    * around one representative, and for containment the high-df
    * boilerplate shingles are often exactly the near-superset signal
    * (the shared wrapper text) — a contained/container pair whose ONLY
    * co-shingles are above-cap surfaces only if one side is the star
    * representative. Size `maxDF` above the corpus's boilerplate df
    * when containment recall matters, or pre-strip boilerplate
    * ([[TextAnalysis]] HTML/quality passes) before shingling; the
    * `d_containment_pairs` gate feeds a corpus whose planted
    * containment shingles all sit below the cap, so its oracle
    * legitimately enumerates all co-shingle pairs. The verification
    * emits BOTH
    * directed containments and keeps pairs whose overlap coefficient
    * `max(c_a_in_b, c_b_in_a)` ≥ `threshold`. Output:
    * (id_a, id_b, n_common, c_a_in_b, c_b_in_a), id_a < id_b. */
  def containmentPairs(docs: DataFrame, n: Int, threshold: Double,
                       maxDF: Int = 1000,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containment threshold must be in (0, 1], got $threshold")
    val sh = Checkpoints.cut(shingled(docs, n, idCol, textCol))
    // Exact co-count prefilter (r14; the generator-evidence bound on
    // [[coCountedCandidates]]): max containment = n_common / min(|A|,|B|)
    // and n_common ≤ c_cold + min(n_hot_a, n_hot_b), so a candidate whose
    // BOUND ratio misses the threshold can never pass the final filter —
    // drop it on narrow (id, size, n_hot) dims BEFORE the wide shingle
    // arrays join in (IEEE division is monotone in an integer numerator
    // over the same denominator, so bound ≥ true ratio holds in double
    // arithmetic exactly as it does over the rationals; containment has
    // no Jaccard-style size-ratio bound — overlap/min is scale-free in
    // the sizes — which is why the bound comes from the generator's own
    // co-occurrence evidence instead).
    val (cand, hotCounts) = coCountedCandidates(sh, maxDF)
    val dims = sh.select(col("id"), size(col("shingles")).cast("long")
        .as("sz"))
      .join(hotCounts, Seq("id"), "left")
      .select(col("id"), col("sz"),
        coalesce(col("n_hot"), lit(0L)).as("n_hot"))
    cand
      .join(dims.select(col("id").as("id_a"), col("sz").as("sz_a"),
        col("n_hot").as("nh_a")), "id_a")
      .join(dims.select(col("id").as("id_b"), col("sz").as("sz_b"),
        col("n_hot").as("nh_b")), "id_b")
      .filter((col("c_cold") + least(col("nh_a"), col("nh_b")))
        .cast("double") / least(col("sz_a"), col("sz_b")).cast("double")
        >= threshold)
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")),
        "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")),
        "id_b")
      .withColumn("n_common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("c_a_in_b",
        col("n_common").cast("double") / size(col("sh_a")).cast("double"))
      .withColumn("c_b_in_a",
        col("n_common").cast("double") / size(col("sh_b")).cast("double"))
      .filter(greatest(col("c_a_in_b"), col("c_b_in_a")) >= threshold)
      .select("id_a", "id_b", "n_common", "c_a_in_b", "c_b_in_a")
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against a
    * `(id, shingles, ...)` staging frame (shared by [[jaccardPairs]] and
    * [[minHashPairs]]).
    *
    * Size-ratio prefilter (the set-similarity-join length filter,
    * Xiao et al., "Efficient Similarity Joins for Near Duplicate
    * Detection", WWW'08 §3): |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥
    * max(|A|,|B|), so J(A,B) ≤ min/max — a pair whose smaller shingle
    * set is under `threshold ×` the larger CANNOT reach the threshold
    * and is dropped BEFORE the O(|A|+|B|) `array_intersect`, on two
    * codegen'd `size` calls. EXACT (no false drops by the bound above);
    * at the `d_jaccard_pairs` corpus it prunes 64% of candidates and
    * halves verification wall time (r14 measurement). */
  private def verifiedJaccard(candidates: DataFrame, sh: DataFrame,
                              threshold: Double): DataFrame =
    candidates
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")),
        "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")),
        "id_b")
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double")
        >= lit(threshold) *
          greatest(size(col("sh_a")), size(col("sh_b"))).cast("double"))
      .withColumn("n_common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common"))
          .cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** MinHash signature: `numHashes` min-values over the shingle set,
    * Carter–Wegman double hashing — deterministic across executors, no
    * RNG state to ship. Returns an array<long> column.
    *
    * Dispatches to the native codegen'd
    * [[graft.functions.MinHashSigExpr]] (one compiled loop per row); the
    * interpreted HOF form survives as [[minHashSignatureComposed]] for
    * property-testing bit-equality. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.functions.MinHashSigExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(shingles),
        numHashes))

  /** The `functions`-composed MinHash family — reference implementation
    * the native expression is property-tested against. */
  def minHashSignatureComposed(shingles: Column, numHashes: Int): Column = {
    // Carter–Wegman double hashing: each shingle STRING is hashed exactly
    // twice; family member i is h1 + i·h2 (long arithmetic, overflow
    // wraps harmlessly). The naive form — xxhash64(i, s) per member —
    // re-reads every shingle's bytes numHashes times and dominated the
    // whole dedup pipeline.
    val hashed = transform(shingles,
      s => struct(xxhash64(s).as("h1"), xxhash64(s, lit(1)).as("h2")))
    // let-bind `hashed` via a 1-element transform: HOFs have no cross-
    // lambda subexpression elimination, so referencing the expression
    // directly inside the family loop would re-hash the strings numHashes
    // times anyway. A lambda VARIABLE is evaluated once.
    element_at(transform(array(hashed), hs =>
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(hs,
          h => h.getField("h1") + i * h.getField("h2"))))), 1)
  }

  /** MinHash-LSH near-dup pairs: signature → `bands` band keys → equi-join
    * on (band, band_hash) buckets → exact-Jaccard verification of bucket
    * cohabitants. With b bands of r rows, a pair of true Jaccard j collides
    * with prob 1-(1-j^r)^b — at (b=32, r=3), j=0.7 pairs are caught with
    * p > 1-1e-9, so post-verification output equals exact thresholding.
    * Candidate generation is a shuffle on band keys; never all-pairs. */
  def minHashPairs(docs: DataFrame, n: Int, threshold: Double,
                   bands: Int = 32, rowsPerBand: Int = 3,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val numHashes = bands * rowsPerBand
    // The checkpoint MUST sit between the signature and the banding:
    // minHashSignature is an interpreted nested higher-order function
    // (numHashes × |shingles| hash evals per row), and Catalyst's
    // projection collapse would otherwise inline the whole expression
    // into EVERY band lambda (bands × recompute) and again into each
    // self-join side. Materializing (id, shingles, sig) once makes
    // banding a cheap slice+hash over a stored array.
    val sig = Checkpoints.cut(shingled(docs, n, idCol, textCol)
      .withColumn("sig", minHashSignature(col("shingles"), numHashes)))
    // band rows stay NARROW (id, band, bucket): the shingle arrays join in
    // only after candidate-pair dedup, so the band shuffle never carries
    // the wide arrays (at 100 TB the arrays dominate row size).
    val banded = bandRows(sig, bands, rowsPerBand)
    val candidates = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifiedJaccard(candidates, sig, threshold)
  }

  /** Narrow (id, band, bucket) rows from an `(id, ..., sig)` frame —
    * shared by [[minHashPairs]] and the cross-snapshot probe. */
  private[graft] def bandRows(sig: DataFrame, bands: Int,
                              rowsPerBand: Int): DataFrame =
    sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
          lit(rowsPerBand)))))
        .as(Seq("band", "bucket")))

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH banding:
    * two vectors are candidates iff they share at least one of `bands`
    * sign-bit band values; candidates are verified with EXACT cosine
    * against `threshold`.
    *
    * Same shuffle discipline as [[minHashPairs]]: band rows are NARROW
    * (id, band, bucket) — vectors join back only after candidate-pair
    * dedup, so the ×bands explode and band shuffle never carry the arrays.
    * A pair of angle θ collides per band with prob (1-θ/π)^bitsPerBand, so
    * at near-dup thresholds (cosine ≥ 0.9, θ ≤ 0.15π) the defaults catch
    * pairs with P ≈ 1-1e-6 while random pairs (θ ≈ π/2) pass a band with
    * prob 2^-bitsPerBand. Output: (id_a, id_b, cosine), id_a < id_b. */
  def embeddingPairs(vecs: DataFrame, threshold: Double,
                     bands: Int = 4, bitsPerBand: Int = 12,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val base = Checkpoints.cut(vecs.select(col(idCol).as("id"),
      graft.functions.Vectors.hyperplaneBands(col(vecCol), bands,
        bitsPerBand).as("bands")))
    val banded = base.select(col("id"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val candidates = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band")
          && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val side = vecs.select(col(idCol), col(vecCol))
    candidates
      .join(side.select(col(idCol).as("id_a"), col(vecCol).as("v_a")),
        "id_a")
      .join(side.select(col(idCol).as("id_b"), col(vecCol).as("v_b")),
        "id_b")
      .withColumn("cosine",
        graft.functions.Vectors.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** The dedup DELIVERABLE on top of [[minHashPairs]]: near-duplicate
    * CLUSTERS and a survivor per cluster. Pair emission alone under-counts
    * — near-duplication is transitive in practice (a~b, b~c ⇒ one
    * template family even when a!~c misses the threshold) — so the pair
    * graph is closed with the distributed connected-components algorithm
    * and each document maps to the minimum id of its component (itself
    * when it has no near-dup). Output: one row per input document,
    * (idCol, survivor_id); keep rows where the two are equal, route the
    * rest to review/drop.
    *
    * Scale: pairs are LSH-banded (never all-pairs), CC is the O(log n)
    * large/small-star loop over ONLY the paired ids (a tiny subgraph of
    * the corpus), and the final mapping is one left join. */
  def nearDupSurvivors(docs: DataFrame, n: Int, threshold: Double,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    survivorsFromPairs(docs,
      minHashPairs(docs, n, threshold, idCol = idCol, textCol = textCol),
      idCol)

  /** [[nearDupSurvivors]] in embedding space: hyperplane-LSH cosine pairs
    * ([[embeddingPairs]]) closed under transitivity, min-id survivor per
    * component. */
  def embeddingNearDupSurvivors(vecs: DataFrame, threshold: Double,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding"): DataFrame =
    survivorsFromPairs(vecs,
      embeddingPairs(vecs, threshold, idCol = idCol, vecCol = vecCol),
      idCol)

  /** Shared survivor mapping: close a (id_a, id_b) near-dup pair graph
    * with distributed connected components (over ONLY the paired ids) and
    * map every row of `all` to the minimum id of its component — itself
    * when unpaired. */
  private def survivorsFromPairs(all: DataFrame, pairs: DataFrame,
                                 idCol: String): DataFrame = {
    val cc = graft.bel.ConnectedComponents.run(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    val canon = cc.groupBy("component").agg(min("node").as("survivor_id"))
    val mapped = cc.join(canon, "component")
      .select(col("node").as(idCol), col("survivor_id"))
    all.select(col(idCol))
      .join(mapped, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("survivor_id"), col(idCol)).as("survivor_id"))
  }

  /** SimHash Hamming-band near-dup pairs — the candidate-generation
    * operator over [[simHash]] fingerprints (Manku, Jain, Das Sarma:
    * "Detecting Near-Duplicates for Web Crawling", WWW'07): split the
    * 64-bit fingerprint into `maxHamming + 1` bit-bands; by pigeonhole,
    * any pair within Hamming distance `maxHamming` leaves at least one
    * band untouched, so bucketing on (band, band value) has GUARANTEED
    * recall at the exact-verification threshold — output is precisely the
    * pair set at Hamming ≤ maxHamming, like [[jaccardPairs]]'s exactness.
    *
    * Same shuffle discipline as [[minHashPairs]]: band rows are NARROW
    * (id, band, bucket); fingerprints join back only after candidate-pair
    * dedup, and verification is one codegen'd `bit_count(xor)`. Default
    * maxHamming=3 → 4 bands of 16 bits: a band key has 2¹⁶ values, so
    * bucket lists stay selective at corpus scale (the WWW'07 operating
    * point); raising maxHamming widens bands' recall guarantee but
    * coarsens buckets — beyond ~7 prefer [[minHashPairs]].
    * Output: (id_a, id_b, hamming) with id_a < id_b. */
  def simHashPairs(docs: DataFrame, n: Int = 3, maxHamming: Int = 3,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val fp = Checkpoints.cut(docs.select(col(idCol).as("id"),
      simHash(TextAnalysis.wordShingleHashes(col(textCol), n)).as("fp")))
    hammingPairs(fp, maxHamming)
  }

  /** Hamming-band candidate pairing over ANY 64-bit fingerprint frame
    * `(id, fp)` — the pigeonhole core shared by text SimHash
    * ([[simHashPairs]]) and perceptual image hashes
    * ([[Multimodal.imageNearDupPairs]]): fingerprints within `maxHamming`
    * differ in ≤ maxHamming of the maxHamming+1 bit-bands, so at least
    * one band matches exactly — banded equi-join candidates are COMPLETE,
    * and the final XOR bit-count verifies only co-bucketed pairs.
    * Output: (id_a, id_b, hamming), id_a < id_b. */
  def hammingPairs(fp: DataFrame, maxHamming: Int): DataFrame = {
    val bands = maxHamming + 1
    require(bands >= 2 && bands <= 64, s"need 1 <= maxHamming($maxHamming) <= 63")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val banded = fp.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("fp"), b * bits).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bucket")))
    val candidates = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band")
          && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(fp.select(col("id").as("id_a"), col("fp").as("fp_a")), "id_a")
      .join(fp.select(col("id").as("id_b"), col("fp").as("fp_b")), "id_b")
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** SimHash 64-bit text fingerprint over shingle HASHES (the
    * [[TextAnalysis.wordShingleHashes]] substrate — already xxhash64
    * outputs, so the votes come straight off the hash bits): sum ±1 per
    * bit position weighted by presence, sign → bit. Near-dup candidates =
    * fingerprints at small Hamming distance (bucketed into bit-bands by
    * [[simHashPairs]]).
    *
    * Dispatches to the native codegen'd [[graft.functions.SimHashExpr]]
    * (one compiled loop per row); the interpreted HOF form survives as
    * [[simHashComposed]] for property-testing bit-equality. */
  def simHash(shingleHashes: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.functions.SimHashExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(shingleHashes)))

  /** Positional word n-gram hashes: UNLIKE [[TextAnalysis.wordShingleHashes]]
    * (sorted distinct SET semantics for Jaccard), this keeps every gram at
    * its word offset — the substrate substring-level dedup needs. Documents
    * shorter than n words contribute no grams. Narrow, one pass. */
  private[graft] def posGramHashes(text: Column, n: Int): Column =
    graft.functions.Exprs.bound(
      split(TextAnalysis.normalized(text), " ")) { words =>
      when(size(words) >= n,
        transform(sequence(lit(0), size(words) - n),
          i => xxhash64((1 to n).map(j => element_at(words, i + j)): _*)))
        .otherwise(array().cast("array<bigint>"))
    }

  /** Substring-level duplicate spans (the operator behind Lee et al.:
    * "Deduplicating Training Data Makes Language Models Better", ACL 2022
    * — suffix-array substring dedup, re-expressed relationally): a word
    * position is DUPLICATED when the n-gram starting there occurs at least
    * `minCount` times anywhere in the corpus (across documents or repeated
    * within one); runs of duplicated positions merge into maximal spans,
    * the unit a pipeline cuts out of training text.
    *
    * Relational shape instead of a suffix array: positional gram hashes
    * (narrow pass) → one hash-groupBy for corpus-frequency (map-side
    * combined; the 100 TB analogue of the suffix array's duplicate scan) →
    * equi-join marks duplicated positions → per-document interval merge
    * under a (doc)-partitioned window — never a global sort, never
    * all-pairs. Two grams merge when their word intervals overlap or
    * touch (next start ≤ prev start + n).
    *
    * Output: (idCol, span_start, span_end, n_grams) — word offsets,
    * 0-based inclusive; span_end = last covered word. Exact up to 64-bit
    * gram-hash collisions (~k²/2⁶⁵ for k distinct grams). */
  def duplicateSpans(docs: DataFrame, n: Int = 5, minCount: Int = 2,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(n >= 1 && minCount >= 2, s"need n >= 1, minCount >= 2")
    import org.apache.spark.sql.expressions.Window
    val grams = Checkpoints.cut(docs
      .select(col(idCol).as("id"),
        posexplode(posGramHashes(col(textCol), n)).as(Seq("pos", "gram")))
      .select(col("id"), col("pos").cast("long").as("pos"), col("gram")))
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select("gram")
    val marked = grams.join(dup, Seq("gram"), "left_semi")
    val w = Window.partitionBy("id").orderBy("pos")
    marked
      .withColumn("prev", lag("pos", 1).over(w))
      .withColumn("new_span",
        when(col("prev").isNull || col("pos") > col("prev") + n, 1L)
          .otherwise(0L))
      .withColumn("span_id", sum("new_span").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("id", "span_id")
      .agg(min("pos").as("span_start"),
        (max("pos") + (n - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"),
        col("n_grams"))
  }

  /** The CUT step of Lee-et-al. substring dedup: remove every word
    * covered by a [[duplicateSpans]] span from each document, emitting the
    * cleaned (normalized) text — what a training pipeline actually feeds
    * the tokenizer after substring-level dedup.
    *
    * Scale shape: spans aggregate to ONE doc-sized row per affected
    * document (a handful of (start,end) structs), join back on the doc id
    * equi-key, and the word filtering itself is a nested higher-order
    * projection over the split array — the word stream is never exploded
    * and never shuffled. Documents with no duplicated spans pass through
    * with `n_removed = 0`.
    *
    * Output: (idCol, clean_text, n_kept, n_removed); `clean_text` is
    * single-space-joined normalized words, "" when everything was cut. */
  def cutSpans(docs: DataFrame, n: Int = 5, minCount: Int = 2,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val spanLists = duplicateSpans(docs, n, minCount, idCol, textCol)
      .groupBy(col(idCol).as("id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("spans"))
    docs
      .join(spanLists, col(idCol) === col("id"), "left")
      .select(col(idCol),
        graft.functions.Exprs.bound(
          split(TextAnalysis.normalized(col(textCol)), " ")) { words =>
          graft.functions.Exprs.bound(
            coalesce(col("spans"),
              array().cast("array<struct<span_start:bigint,span_end:bigint>>"))
          ) { spans =>
            graft.functions.Exprs.bound(
              filter(words, (_, i) => !exists(spans, s =>
                i.cast("long") >= s.getField("span_start") &&
                  i.cast("long") <= s.getField("span_end")))) { kept =>
              struct(concat_ws(" ", kept).as("clean_text"),
                size(kept).cast("long").as("n_kept"),
                (size(words) - size(kept)).cast("long").as("n_removed"))
            }
          }
        }.as("r"))
      .select(col(idCol), col("r.clean_text"), col("r.n_kept"),
        col("r.n_removed"))
  }

  /** Corpus-wide LINE-level dedup (the C4/Dolma curation step: boilerplate
    * lines — navigation, licenses, cookie banners — repeat across millions
    * of pages): every duplicate occurrence of a line is removed, keeping
    * only its FIRST occurrence by (id, line index); documents are then
    * reassembled in original line order. Lines shorter than `minLineChars`
    * are exempt (blank separators and trivial lines stay where they are).
    * A document whose every line was elsewhere first comes back as an
    * empty string, not a dropped row — the caller decides on a length
    * filter downstream.
    *
    * Scale shape: two key shuffles and one equi-join, nothing all-pairs —
    * (1) survivor map: groupBy(line) with an orderable-struct min, so the
    * hottest boilerplate line reduces map-side to one (id, ix) pair per
    * task; (2) kept-flag join back on the line key (survivor side is one
    * row per DISTINCT line; AQE skew-join splits the hot keys); (3)
    * per-document rebuild: groupBy(id) + array_sort on the collected
    * (ix, kept, line) structs — per-document state, bounded by document
    * size, exactly the k1 merge shape.
    * Output: (idCol, text, n_kept, n_dropped). */
  def dedupLines(docs: DataFrame, minLineChars: Int = 1,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    // NULL text reads as one empty line (posexplode over a NULL split
    // would emit ZERO rows and silently drop the document, breaking the
    // every-doc-comes-back contract); the empty line is below any
    // positive minLineChars, so such a doc round-trips as "".
    val lines = docs
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("ix", "line")))
    val eligible = length(col("line")) >= minLineChars
    val survivors = lines.filter(eligible)
      .groupBy("line")
      .agg(min(struct(col(idCol), col("ix"))).as("s"))
    lines.join(survivors, Seq("line"), "left")
      .select(col(idCol), col("ix"), col("line"),
        (col("s").isNull ||
          (col(s"s.$idCol") === col(idCol) && col("s.ix") === col("ix")))
          .as("kept"))
      .groupBy(idCol)
      .agg(collect_list(struct(col("ix"), col("kept"), col("line")))
        .as("ls"))
      .select(col(idCol),
        array_sort(col("ls")).as("ls"))
      .select(col(idCol),
        concat_ws("\n", transform(filter(col("ls"), l => l.getField("kept")),
          l => l.getField("line"))).as("text"),
        size(filter(col("ls"), l => l.getField("kept")))
          .cast("long").as("n_kept"),
        size(filter(col("ls"), l => !l.getField("kept")))
          .cast("long").as("n_dropped"))
  }

  /** The `functions`-composed SimHash — reference implementation the
    * native expression is property-tested against. */
  private[graft] def simHashComposed(shingleHashes: Column): Column = {
    // One pass over the shingle hashes: accumulate a 64-long vote vector
    // (+1 when bit j of the hash is set, else -1), then pack vote signs
    // into a single long. Bit positions are unrolled statically
    // (shiftright needs a literal shift). NULL elements contribute the
    // engine seed, like composed xxhash64 over a null child.
    val votes = aggregate(shingleHashes, array_repeat(lit(0L), 64),
      (acc, s) => {
        val h = coalesce(s, lit(42L))
        val bits = array((0 until 64).map(j =>
          when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L))): _*)
        zip_with(acc, bits, (a, b) => a + b)
      })
    aggregate(votes, lit(0L), (acc, v) =>
      shiftleft(acc, 1).bitwiseOR(when(v >= 0, lit(1L)).otherwise(lit(0L))))
  }

  /** SemDeDup-style semantic dedup (cluster-then-prune, the published
    * recipe of Abbas et al. 2023, arXiv:2303.09540): assign every
    * embedding to its nearest centroid, then drop near-identical pairs
    * WITHIN each cluster only — the clustering bounds the quadratic term
    * to cluster sizes, so the corpus never goes all-pairs.
    *
    * Pruning rule is the deterministic "dominated-by-earlier" blanket: a
    * vector is dropped iff SOME lower-id vector in its cluster has
    * cosine ≥ `tau` with it (one self-join + one anti-join — no
    * iteration, no chain-dependence on which earlier vectors themselves
    * survive, and therefore exactly expressible as a SQL oracle).
    *
    * `centroids` (cid, `vecCol`) is caller-supplied: production derives
    * it from a k-means pass (e.g. [[IvfIndex]]'s trainer) with k scaled
    * ∝ corpus size so clusters stay bounded; the correctness gate uses
    * fixed seed vectors so assignment is engine-reproducible. Ties on
    * assignment resolve to the smallest cid.
    *
    * Scale shape: centroids broadcast (driver-sized by contract, like IVF
    * centroids); assignment is a narrow crossJoin + max-struct argmax
    * with map-side partials; the self-join shuffles once on the cluster
    * id. A pathologically hot cluster pays its own quadratic — that is
    * the SemDeDup contract (k must grow with N), not a plan defect.
    *
    * Output: (id, cell) — surviving ids with their cluster assignment. */
  def semanticSurvivors(vecs: DataFrame, centroids: DataFrame, tau: Double,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val cos = graft.functions.Vectors.cosine _
    val scored = vecs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(
        centroids.select(col("cid"), col(vecCol).as("cv"))))
      .select(col("id"), col("v"), col("cid"),
        cos(col("v"), col("cv")).as("c"))
    val assigned = Checkpoints.cut(scored
      .groupBy("id")
      .agg(max(struct(col("c"), (-col("cid")).as("nc"), col("cid"),
        col("v"))).as("m"))
      .select(col("id"), col("m.cid").as("cell"), col("m.v").as("v")))
    val dominated = assigned.alias("a")
      .join(assigned.alias("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id") &&
          cos(col("a.v"), col("b.v")) >= tau)
      .select(col("b.id").as("id")).distinct()
    assigned.join(dominated, Seq("id"), "left_anti")
      .select(col("id"), col("cell").cast("long").as("cell"))
  }

  /** Persist the exact-fingerprint index of a corpus snapshot: one row per
    * distinct normalized text, `(fingerprint, survivor_id, n_copies)` —
    * the cross-snapshot dedup substrate (a new crawl is deduplicated
    * against every PRIOR snapshot without re-reading the prior corpora;
    * the CCNet / Dolma "dedupe against earlier dumps" step). The index is
    * fingerprint-keyed parquet: at 100 TB the corpus reduces to one
    * ~50-byte row per distinct document, and every later probe touches
    * only this reduced frame. */
  def writeFingerprintIndex(docs: DataFrame, path: String,
                            idCol: String = "doc_id",
                            textCol: String = "text"): Unit =
    exactSurvivors(docs, idCol, textCol)
      .write.mode("overwrite").parquet(path)

  /** Incremental (cross-snapshot) exact dedup: dedupe `batch` WITHIN
    * itself, then drop every document whose fingerprint the persisted
    * index already holds. Output: the batch's genuinely-new survivors,
    * `(fingerprint, survivor_id, n_copies)` — same shape as
    * [[exactSurvivors]], so downstream policy code is snapshot-agnostic.
    *
    * Scale shape: one hash-groupBy over the batch, then ONE anti-join on
    * the 16-byte fingerprint key. The index side is already distinct, so
    * the anti-join shuffles at most |distinct batch| + |index| rows; when
    * the index fits the broadcast threshold Catalyst broadcasts it and
    * the probe is shuffle-free. Nothing rescans prior corpora. */
  def incrementalSurvivors(spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, batch: DataFrame,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val index = spark.read.parquet(indexPath).select("fingerprint")
    exactSurvivors(batch, idCol, textCol)
      .join(index, Seq("fingerprint"), "left_anti")
  }

  /** Fold a probed batch into the index: append the batch's new-survivor
    * rows ([[incrementalSurvivors]]) so the NEXT snapshot dedupes against
    * this one too. Append-only parquet — no rewrite of the existing
    * index files, so the index grows by exactly the novel-document rate
    * per snapshot. Returns the number of appended fingerprints. */
  def appendToFingerprintIndex(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, batch: DataFrame,
                               idCol: String = "doc_id",
                               textCol: String = "text"): Long = {
    val fresh = incrementalSurvivors(spark, indexPath, batch, idCol, textCol)
      .persist()
    try {
      val n = fresh.count()
      if (n > 0) fresh.write.mode("append").parquet(indexPath)
      n
    } finally { fresh.unpersist(); () }
  }

  /** Bucket-partition count of the persisted BAND layout
    * ([[bandLayoutPath]]): band rows land under `bp = pmod(bucket, NB)`
    * directories so a probe's scan prunes to the batch's own buckets'
    * partitions (the k15/a28 partition-discipline applied to the
    * near-dup index — the fix for the full-index-rescan-per-probe
    * scale class). 64 partitions keeps directory counts tame while a
    * batch of any realistic size still touches a strict subset. */
  private[graft] val BandIndexPartitions = 64

  /** The persisted band layout lives BESIDE the signature layout (a
    * sibling `<path>_bands` directory, partitioned by `bp`), not under
    * it — a plain `spark.read.parquet(path)` of the signature rows must
    * never pick up band rows via partition discovery. */
  private[graft] def bandLayoutPath(indexPath: String): String =
    s"${indexPath}_bands"

  /** [[bandRows]] plus the persisted layout's partition column. */
  private[graft] def bandRowsPartitioned(sig: DataFrame, bands: Int,
                                         rowsPerBand: Int): DataFrame =
    bandRows(sig, bands, rowsPerBand)
      .withColumn("bp", pmod(col("bucket"), lit(BandIndexPartitions.toLong)))

  /** Append `(id, shingles, sig)` rows to BOTH index layouts: band rows
    * (bucket-partitioned, [[bandRowsPartitioned]]) FIRST, then the
    * signature rows. The ordering closes the crash window: a doc whose
    * signature row landed always has its band rows on disk too (band
    * appends complete before the signature job starts), so a replay's
    * probe self-matches it (Jaccard 1) and never re-appends — signature
    * rows stay unique per id. The converse window (bands landed,
    * signatures not) only re-appends band rows, and duplicate band rows
    * are harmless: candidates are deduplicated on (id_a, id_b) before
    * verification. */
  private[graft] def appendMinHashIndexRows(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      rows: DataFrame, bands: Int, rowsPerBand: Int): Unit = {
    bandRowsPartitioned(rows, bands, rowsPerBand)
      .write.mode("append").partitionBy("bp")
      .parquet(bandLayoutPath(indexPath))
    rows.write.mode("append").parquet(indexPath)
  }

  /** Persist the MinHash index of a corpus snapshot: per document its
    * shingle-hash set and MinHash signature (`(id, shingles, sig)`), the
    * cross-snapshot NEAR-dup substrate beside
    * [[writeFingerprintIndex]]'s exact one. Shingle sets ride along
    * because the probe verifies candidates with EXACT Jaccard — the
    * banding only generates candidates, so probe output carries no
    * LSH false positives (same discipline as [[minHashPairs]]).
    *
    * TWO layouts land: the signature rows at `path`, and the narrow
    * band rows `(id, band, bucket)` at [[bandLayoutPath]] partitioned
    * by `pmod(bucket, NB)` — the posting-table side of the probe's
    * partition-pruned equi-join, derived ONCE here instead of
    * re-derived from every signature on every probe. `bands ×
    * rowsPerBand` is the signature length; a probe must use the same
    * split. Build is single-writer: a crash mid-build leaves the
    * layouts inconsistent — re-run the build (overwrite semantics). */
  def writeMinHashIndex(docs: DataFrame, path: String, n: Int = 3,
                        bands: Int = 32, rowsPerBand: Int = 3,
                        idCol: String = "doc_id",
                        textCol: String = "text"): Unit = {
    val sig = Checkpoints.cut(shingled(docs, n, idCol, textCol)
      .withColumn("sig",
        minHashSignature(col("shingles"), bands * rowsPerBand)))
      .persist()
    try {
      bandRowsPartitioned(sig, bands, rowsPerBand)
        .write.mode("overwrite").partitionBy("bp")
        .parquet(bandLayoutPath(path))
      sig.write.mode("overwrite").parquet(path)
    } finally { sig.unpersist(); () }
  }

  /** Cross-snapshot near-dup probe: every (batch doc, indexed doc) pair
    * with exact n-gram Jaccard ≥ `threshold`, found WITHOUT comparing
    * the batch against the whole index — candidates are generated by the
    * MinHash band equi-join (a pair of true Jaccard j escapes all bands
    * with prob (1-j^r)^b — ~5e-10 at the 0.8/32/3 defaults), then
    * verified exactly from the stored shingle sets. Output:
    * `(id, index_id, jaccard)`.
    *
    * Scale shape: band rows are NARROW on both sides (id, band, bucket),
    * and the index side comes from the PERSISTED band layout
    * ([[bandLayoutPath]], written at build/append time) with the scan
    * pruned to the batch's own `bp` partitions — per-probe cost scales
    * with the batch's bucket collisions, not the index size (the
    * k15 PartitionFilters discipline; an index written by an older
    * build without the band layout falls back to deriving band rows
    * from the full signature scan). The index's shingle arrays are
    * touched only for collided candidate ids. The index is never
    * self-joined — probing a small crawl against a 100 TB-corpus index
    * moves batch-sized band rows plus the collided partitions' posting
    * rows only. `n`/`bands`/`rowsPerBand` must match the index build. */
  def incrementalNearDups(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, batch: DataFrame,
                          n: Int = 3, threshold: Double = 0.8,
                          bands: Int = 32, rowsPerBand: Int = 3,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val staged = Checkpoints.cut(shingled(batch, n, idCol, textCol)
      .withColumn("sig",
        minHashSignature(col("shingles"), bands * rowsPerBand)))
    probeNearDups(spark, staged, indexPath, threshold, bands, rowsPerBand)
  }

  /** The probe core of [[incrementalNearDups]], over an ALREADY-staged
    * `(id, shingles, sig)` frame — shared with the streaming face
    * ([[graft.streaming.NearDupStream]]), which stages once per batch
    * and probes/blankets/appends from the same frame. The batch's band
    * rows are cut once (they are read twice: the distinct-`bp` driver
    * list that prunes the index scan, and the candidate join). */
  private[graft] def probeNearDups(
      spark: org.apache.spark.sql.SparkSession, staged: DataFrame,
      indexPath: String, threshold: Double, bands: Int,
      rowsPerBand: Int): DataFrame = {
    val index = spark.read.parquet(indexPath)
    val bandPath = bandLayoutPath(indexPath)
    val batchBands = Checkpoints.cut(
      bandRowsPartitioned(staged, bands, rowsPerBand))
    val indexBands =
      if (graft.core.Fs.exists(spark, bandPath)) {
        // ≤ BandIndexPartitions longs to the driver, then an isin that
        // lands in the scan's PartitionFilters: untouched partitions
        // are never opened (plan-pinned by DedupIndexLayoutSpec)
        val touched = batchBands.select("bp").distinct()
          .collect().map(_.getLong(0)).sorted
        spark.read.parquet(bandPath)
          .filter(col("bp").isin(touched.toIndexedSeq: _*))
      } else bandRows(index, bands, rowsPerBand) // pre-band-layout index
    val candidates = batchBands.alias("a")
      .join(indexBands.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(staged.select(col("id").as("id_a"), col("shingles").as("sh_a")),
        "id_a")
      .join(index.select(col("id").as("id_b"), col("shingles").as("sh_b")),
        "id_b")
      // exact size-ratio prefilter — J ≤ min/max (see [[verifiedJaccard]])
      .filter(least(size(col("sh_a")), size(col("sh_b"))).cast("double")
        >= lit(threshold) *
          greatest(size(col("sh_a")), size(col("sh_b"))).cast("double"))
      .withColumn("n_common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common"))
          .cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("id"), col("id_b").as("index_id"),
        col("jaccard"))
  }

  /** Production entry for [[semanticSurvivors]]: centroids from the
    * distributed k-means refiner ([[Similarity.refineCentroids]] — sample
    * seeds + mean/assign iterations) instead of caller-supplied seeds.
    * Refined centroids are ulp-nondeterministic across partitionings
    * (doubles summed in partition order), so this path is pinned by
    * invariant specs; the SQL-oracle gate (`d_semantic_prune`) covers the
    * assignment + dominance core through the fixed-seed entry. */
  def semanticSurvivorsAuto(vecs: DataFrame, k: Int, tau: Double,
                            iterations: Int = 3, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val (ids, cents) = Similarity.refineCentroids(vecs, k, iterations,
      idCol, vecCol)
    val spark = vecs.sparkSession
    import spark.implicits._
    val centDf = ids.zip(cents).toDF("cid", vecCol)
    semanticSurvivors(vecs, centDf, tau, idCol, vecCol)
  }
}
