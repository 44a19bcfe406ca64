package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Product quantization (Jégou, Douze, Schmid: "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011) — the memory-compression
  * axis of ANN, complementary to the IVF partition pruning of
  * [[Similarity.ivfTopK]] / [[IvfIndex]]: a d-dim float vector becomes M
  * small integer codes (one per d/M-dim subspace), a ~(4d/M)× footprint
  * reduction that lets a 100 TB embedding corpus live as a compact code
  * table while queries scan codes, not vectors.
  *
  * Scale shape:
  *  - codebook TRAINING is driver-side Lloyd over a hash-deterministic
  *    corpus sample — dimension-table scale by contract, the same
  *    posture as [[Similarity.sampleCentroids]];
  *  - ENCODING is one narrow codegen'd pass, no shuffle/join: per
  *    subspace the existing [[graft.functions.NearestCells]] kernel runs
  *    over the sliced vector, so plan and generated-code size stay O(1)
  *    in K;
  *  - ADC SCORING (asymmetric distance computation) precomputes each
  *    query's M×K distance table once (driver arithmetic over
  *    driver-sized queries), broadcasts the tables, and scores a corpus
  *    row with M table lookups over its code array — the corpus vectors
  *    are never touched;
  *  - the standard RE-RANK rescores only the ADC top-C candidates with
  *    exact cosine, restoring exact ordering among survivors.
  */
object ProductQuantization {

  /** Trained PQ model: `books(m)(j)` is codeword j of subspace m
    * (driver-sized: m·k·(d/m) = k·d doubles). */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
                             books: Seq[Seq[Seq[Double]]])

  private def sqDist(a: Array[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic driver-side Lloyd: hash-ordered distinct init, fixed
    * iteration order — same sample, same codebook, every run. The distinct
    * is by CONTENT (Array equality is reference equality, so a raw
    * `.distinct` on Array[Double] would be a no-op and duplicate sample
    * vectors would seed duplicate centroids that never separate). */
  private def lloyd(pts: Array[Array[Double]], k: Int,
                    iters: Int): Seq[Seq[Double]] = {
    val init = pts.map(_.toSeq).distinct.take(k)
    var cents: Array[Seq[Double]] = init
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(
        new Array[Double](pts.head.length))
      val counts = new Array[Long](cents.length)
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue; var j = 0
        while (j < cents.length) {
          val d = sqDist(p, cents(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
      }
      cents = cents.indices.map { j =>
        if (counts(j) == 0) cents(j) // empty cluster keeps its codeword
        else sums(j).map(_ / counts(j)).toSeq
      }.toArray
    }
    cents.toSeq
  }

  /** Train M codebooks of K codewords on a hash-deterministic sample of
    * the corpus. `d % m == 0` required. */
  def train(corpus: DataFrame, m: Int, k: Int, iterations: Int = 5,
            sampleSize: Int = 2048, idCol: String = "vec_id",
            vecCol: String = "embedding"): Codebooks = {
    val sample = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(xxhash64(col(idCol)))
      .limit(sampleSize)
      .collect()
      .map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    require(sample.nonEmpty, "empty corpus")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    val books = (0 until m).map { mi =>
      lloyd(sample.map(v =>
        java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub)), k,
        iterations)
    }
    Codebooks(m, k, sub, books)
  }

  /** Code column: `array<int>` of length M — per subspace, the nearest
    * codeword index via the native NearestCells kernel over the sliced
    * vector (the kernel is float/double-agnostic, so the raw array is
    * sliced directly — a `transform`-based cast would be a HOF and drop
    * the projection out of whole-stage codegen). Narrow, O(1) plan size
    * in K.
    *
    * Assignment metric is L2 (`useL2 = true`), matching [[lloyd]] training
    * and the ADC tables' squared-Euclidean distances — Jégou's algorithm
    * requires one metric end-to-end, and a cosine argmax here would pick a
    * codeword that is NOT the L2-nearest whenever codeword norms differ,
    * systematically misranking ADC candidates. Cosine remains the metric
    * for the IVF cell probe, which ranks by cosine by contract. */
  def codesCol(vec: Column, cb: Codebooks): Column =
    array((0 until cb.m).map { mi =>
      element_at(Similarity.cellsOfCol(
        slice(vec, mi * cb.subDim + 1, cb.subDim),
        (0L until cb.k.toLong).toSeq, cb.books(mi), 1, useL2 = true), 1)
        .cast("int")
    }: _*)

  /** Encode the corpus: (id, codes) — the compact form a production
    * pipeline persists instead of raw vectors. */
  def encode(corpus: DataFrame, cb: Codebooks,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("id"), codesCol(col(vecCol), cb).as("codes"))

  /** ADC top-k: score every corpus row against each query's broadcast
    * M×K distance table with M array lookups, then (optionally) re-rank
    * the ADC top-`rerankFrom` candidates by exact cosine. Output matches
    * the other top-k operators: (query_id, rank, id, cosine) — with
    * `rerankFrom == 0` the `cosine` column is the NEGATED ADC squared
    * distance (bigger = closer), not a cosine. */
  /** Per-query ADC distance tables: `(query_id, M×K partial squared
    * distances)` — driver arithmetic over driver-sized queries. */
  private[ops] def distTables(queries: DataFrame,
                              cb: Codebooks): Seq[(Long, Seq[Seq[Double]])] =
    queries
      .select(col("query_id").cast("long"), Vectors.toDouble(col("embedding")))
      .collect()
      .map { r =>
        val q = r.getSeq[Double](1).toArray
        val tab = (0 until cb.m).map { mi =>
          val qs = java.util.Arrays.copyOfRange(q, mi * cb.subDim,
            (mi + 1) * cb.subDim)
          cb.books(mi).map(cw => sqDist(qs, cw))
        }
        (r.getLong(0), tab)
      }.toSeq

  /** ADC distance of a code array against a query's broadcast table: M
    * array lookups, summed. Dispatches to the native codegen'd
    * [[graft.functions.AdcScore]]; the composed HOF form survives as
    * [[adcScoreComposed]] for property-testing bit-equality. */
  private[ops] def adcScore(codes: Column, dtab: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.functions.AdcScore(
        org.apache.spark.sql.graft.ColumnShim.expression(codes),
        org.apache.spark.sql.graft.ColumnShim.expression(dtab)))

  /** The `functions`-composed ADC family — reference implementation the
    * native expression is property-tested against. */
  private[graft] def adcScoreComposed(codes: Column, dtab: Column): Column =
    aggregate(zip_with(codes, dtab, (c, t) => element_at(t, c + 1)),
      lit(0.0d), _ + _)

  def adcTopK(corpus: DataFrame, cb: Codebooks, queries: DataFrame, k: Int,
              rerankFrom: Int = 0, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = distTables(queries, cb).toDF("query_id", "dtab")
    val coded = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("cvec"), codesCol(col(vecCol), cb).as("codes"))
    val scored = coded.crossJoin(broadcast(qdf))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), col("cvec"),
        adcScore(col("codes"), col("dtab")).as("adc"))
    if (rerankFrom <= 0)
      Similarity.topKPerQuery(
        scored.select(col("query_id"), col("id"), (-col("adc")).as("cosine")),
        k)
    else {
      // ADC candidate cut, then exact cosine over survivors only
      val cand = Similarity.topKPerQuery(
        scored.select(col("query_id"), col("id"), (-col("adc")).as("cosine")),
        rerankFrom).select(col("query_id"), col("id"))
      val qvecs = broadcast(queries.select(col("query_id").cast("long")
        .as("query_id"), col("embedding").as("qvec")))
      val exact = corpus
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("cvec"))
        .join(broadcast(cand), Seq("id"))
        .join(qvecs, Seq("query_id"))
        .select(col("query_id"), col("id"),
          Vectors.cosine(col("qvec"), col("cvec")).as("cosine"))
      Similarity.topKPerQuery(exact, k)
    }
  }
}
