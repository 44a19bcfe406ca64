package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Exprs, Vectors}

/** Principal-component analysis and whitening of an embedding corpus —
  * the linear-algebra prep step large-scale retrieval pipelines run
  * before IVF/PQ/OPQ training (whitened residuals quantize better: Jégou
  * et al., "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011 §V; Babenko & Lempitsky, "The Inverted Multi-Index", CVPR 2012).
  *
  * Scale shape (the 100 TB contract):
  *  - The ONLY distributed work is one second-moment aggregation: rows
  *    explode to (row, dim, value) cells, self-pair by an equi-join on
  *    the row key (co-partitioned after one hash shuffle of d-cell
  *    rows; never a cartesian), and hash-aggregate the d(d+1)/2
  *    products on the (i, j) cell key. Partial aggregation (map-side
  *    combine) reduces every partition to ≤ d(d+1)/2 cells before the
  *    final shuffle, so it carries `cells × partitions` regardless of
  *    corpus size — the centroid/codebook posture. Every operator in
  *    the chain is whole-stage-codegen'd; the tempting HOF form (build
  *    the product structs per row with `transform`) is interpreted per
  *    element and measured 10× slower — see [[pairProducts]].
  *  - The d×d moment matrix (d = 64 → 2 080 cells) collects to the
  *    driver BY CONTRACT (same driver-sized bound as IVF centroids and
  *    BPE merge tables); the eigensolve is a cyclic Jacobi over that
  *    tiny symmetric matrix — O(d³) per sweep on one machine, nothing
  *    distributed to get wrong.
  *  - Projection / whitening are NARROW: the mean and component matrix
  *    ride as ONE reference object inside the native codegen'd
  *    [[graft.functions.AffineProjectExpr]] (one kernel call per row
  *    over primitive arrays, bit-identical to the interpreted HOF form
  *    it replaced) — no join, no shuffle, no UDF.
  *
  * Exactness: [[gramExact]] quantizes each element to `floor(x·scale)`
  * (floor of an IEEE double is engine-identical, unlike half-up
  * rounding) and sums BIGINT products — bit-exact against the DuckDB
  * oracle. Overflow bound: `scale²·max|x|²·rows < 2⁶³`; at scale 1e6 and
  * unit-norm-ish embeddings that holds to ~10⁷ rows — beyond that,
  * widen the product to `decimal(38,0)` (one cast; the aggregation
  * shape is unchanged) or drop to the double path [[fit]] uses.
  */
object Pca {

  /** Fitted model: `mean(i)`, `eigvals(j)` descending, and
    * `components(j)(i)` — the j-th principal axis over input dims i.
    * Sign convention: the largest-magnitude entry of each component is
    * positive (first such entry on ties), so refits are reproducible. */
  case class PcaModel(mean: Array[Double], eigvals: Array[Double],
                      components: Array[Array[Double]]) {
    def dim: Int = mean.length
  }

  /** Exploded `(row, i, e)` cells paired into upper-triangle products
    * `(i, j, p)` via an equi-join on the caller's row id — every
    * operator WHOLE-STAGE CODEGEN'd. The tempting alternative (a
    * higher-order `transform` building the d(d+1)/2 product structs per
    * row) is interpreted per element in Spark — measured 10× slower at
    * d = 64 (~27 s → ~2 s at sf0.1) — so the join form is the hot
    * path. The join key must be the DATA's own id, never a generated
    * `monotonically_increasing_id`: the self-join re-executes its
    * upstream on both sides, and a generated id assigned after any
    * exchange is timing-dependent across re-executions — rows would
    * silently pair with other rows' elements. Co-partitioned after ONE
    * hash shuffle on the id; the downstream aggregation combines
    * map-side onto the cell domain. */
  private def pairProducts(vecs: DataFrame, idCol: String, vecCol: String,
                           quant: Column => Column): DataFrame = {
    // quantization runs on the exploded SCALAR (codegen'd), never as a
    // per-array higher-order transform (interpreted)
    val e0 = vecs
      .select(col(idCol).as("__rid"),
        posexplode(col(vecCol)).as(Seq("i", "e0")))
      .select(col("__rid"), col("i"), quant(col("e0")).as("e"))
    // duplicate-id tripwire (the snapshotDiff posture, lazy in-plan
    // raise_error): a duplicate id value would silently cross-pair
    // elements of DIFFERENT rows through the self-join below and corrupt
    // every downstream moment. Detected as >1 position-0 element per
    // rid via a count over the __rid partition — the same key the join
    // co-locates on, so the window's exchange+sort is work the
    // sort-merge join needs anyway, not an extra corpus shuffle.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__rid")
    val e = e0
      .withColumn("__n0",
        sum(when(col("i") === 0, 1L).otherwise(0L)).over(w))
      .select(col("__rid"), col("i"),
        when(col("__n0") === 1L, col("e")).otherwise(raise_error(concat(
          lit("pairProducts: duplicate id value '"),
          col("__rid").cast("string"),
          lit("' — ids must be unique (duplicates would cross-pair " +
            "elements of different rows)")))).as("e"))
    e.join(e.select(col("__rid"), col("i").as("j"), col("e").as("f")),
        "__rid")
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j"), (col("e") * col("f")).as("p"))
  }

  /** Integer-exact second-moment (Gram) matrix of the quantized corpus:
    * one row per upper-triangle cell `(i, j)` with
    * `s_xy = Σ_rows floor(x_i·scale)·floor(x_j·scale)` and the row count
    * `n` — the heavy distributed stage of a PCA fit, gated bit-exact
    * against the same sums in SQL. One explode + pair join + one
    * map-side-combined hash aggregation; no window. */
  def gramExact(vecs: DataFrame, idCol: String = "vec_id",
                vecCol: String = "embedding",
                scale: Long = 1000000L): DataFrame =
    pairProducts(vecs, idCol, vecCol,
      e => floor(e.cast("double") * scale).cast("long"))
      .groupBy("i", "j")
      .agg(sum(col("p")).as("s_xy"), count(lit(1)).as("n"))

  /** Exact incremental maintenance of [[gramExact]]: moment sums are
    * PURE ADDITIONS, so a delta batch's cell matrix folds into the
    * persisted one bit-exactly — `fold(gram(A), gram(B)) ≡ gram(A ∪ B)`
    * by associativity of integer addition, no approximation, no decay.
    * This is the streaming posture for covariance/PCA upkeep at 100 TB:
    * keep the d(d+1)/2-cell matrix as the persisted index (a few KB),
    * fold each ingest batch's cells in (one dimension-domain
    * aggregation over 2·cells rows), and re-run the driver-side
    * eigensolve on whatever cadence drift demands (the IVF
    * staleness-rebuild discipline) — never re-scan the corpus. */
  def foldGram(index: DataFrame, delta: DataFrame): DataFrame =
    index.select("i", "j", "s_xy", "n")
      .unionByName(delta.select("i", "j", "s_xy", "n"))
      .groupBy("i", "j")
      .agg(sum("s_xy").as("s_xy"), sum("n").as("n"))

  /** Population covariance of the corpus as an upper-triangle frame
    * `(i, j, cov, n)` — the distributed half of a PCA fit, also useful
    * standalone (feature-correlation audits). Same one-explode
    * aggregation shape as [[gramExact]] in doubles, plus two
    * dimension-sized mean joins (broadcast — d rows). */
  def covariance(vecs: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val mu = vecs
      .select(posexplode(Vectors.toDouble(col(vecCol)))
        .as(Seq("dim", "e")))
      .groupBy("dim").agg(avg("e").as("mu"))
    val moments = pairProducts(vecs, idCol, vecCol, _.cast("double"))
      .groupBy("i", "j")
      .agg(sum(col("p")).as("sxy"), count(lit(1)).as("n"))
    moments
      .join(broadcast(mu.select(col("dim").as("i"), col("mu").as("mu_i"))),
        "i")
      .join(broadcast(mu.select(col("dim").as("j"), col("mu").as("mu_j"))),
        "j")
      .select(col("i"), col("j"),
        (col("sxy") / col("n") - col("mu_i") * col("mu_j")).as("cov"),
        col("n"))
  }

  /** Fit a PCA model over `array<float|double>` vectors. Two passes over
    * the corpus (means, then centered second moments — both map-side
    * combined), one driver-side Jacobi eigensolve. All vectors must
    * share one dimensionality (the embedding-corpus contract). */
  def fit(vecs: DataFrame, idCol: String = "vec_id",
          vecCol: String = "embedding"): PcaModel = {
    val x = vecs.select(Vectors.toDouble(col(vecCol)).as("__v"))
    val dims = x.select(posexplode(col("__v")).as(Seq("dim", "e")))
      .groupBy("dim").agg(avg("e").as("mu"))
      .orderBy("dim").collect()
    require(dims.nonEmpty, "Pca.fit: empty or vector-less input")
    val mean = dims.map(_.getDouble(1))
    val d = mean.length

    val cells = pairProducts(vecs, idCol, vecCol, _.cast("double"))
      .groupBy("i", "j")
      .agg(sum(col("p")).as("sxy"), count(lit(1)).as("n"))
      .collect()
    val cov = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val c = r.getDouble(2) / r.getLong(3) - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }

    val (vals, vecsM) = jacobiEigen(cov)
    // Descending eigenvalue order + deterministic sign.
    val order = vals.indices.sortBy(k => -vals(k))
    val eigvals = order.map(vals).toArray
    val components = order.map { k =>
      val v = Array.tabulate(d)(i => vecsM(i)(k))
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, eigvals, components)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvector matrix V with V(i)(k) = i-th entry of the
    * k-th eigenvector). Deterministic: fixed sweep order, fixed
    * convergence threshold — same input, same output, every run. Fails
    * fast if the sweep cap is hit before the off-diagonal norm falls
    * below the (scale-relative) tolerance — a silent non-converged
    * spectrum would poison fit/whiten with no error. */
  private[ops] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val scaleNorm = 1.0 + a0.map(r => r.map(math.abs).max).max
    val tol = 1e-12 * scaleNorm
    var sweep = 0
    while (sweep < 100 && offDiagNorm(a) > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // tan of the rotation angle: the classic stable form. For
            // |theta| large enough that theta² overflows, use the
            // first-order 1/(2θ) limit — the naive formula's ±0.0
            // there would otherwise read as "theta == 0" and replace a
            // near-identity rotation with a 45° one.
            val at = math.abs(theta)
            val t =
              if (theta == 0.0) 1.0
              else if (at > 1e150) 1.0 / (2.0 * theta)
              else math.signum(theta) / (at + math.sqrt(at * at + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            rotate(a, v, p, q, c, s)
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    require(offDiagNorm(a) <= tol,
      s"jacobiEigen: no convergence after $sweep sweeps " +
        s"(off-diagonal ${offDiagNorm(a)} > $tol)")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0; val d = a.length
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** One Jacobi rotation zeroing a(p)(q), applied to A and accumulated
    * into V. */
  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
                     p: Int, q: Int, c: Double, s: Double): Unit = {
    val d = a.length
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }

  /** Project each vector onto the top-k principal axes. Narrow: the mean
    * and the flattened component matrix are broadcast literals; each
    * output coordinate is one codegen'd `aggregate(zip_with(...))` dot
    * product — no join, no shuffle. Output: `(idCol, vecCol:
    * array<double> of length k)`. */
  def project(vecs: DataFrame, model: PcaModel, k: Int,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
    projected(vecs, model, k, idCol, vecCol, whitened = false)

  /** [[project]] with each coordinate scaled by `1/√eigval` — unit
    * variance per retained axis (PCA whitening). Axes with non-positive
    * eigenvalue (numerically rank-deficient directions) map to 0.0, the
    * [[Similarity.standardize]] zero-variance posture. */
  def whiten(vecs: DataFrame, model: PcaModel, k: Int,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    projected(vecs, model, k, idCol, vecCol, whitened = true)

  private def whitenScales(model: PcaModel, k: Int,
                           whitened: Boolean): Seq[Double] =
    model.eigvals.take(k).map(ev =>
      if (whitened) { if (ev > 1e-12) 1.0 / math.sqrt(ev) else 0.0 }
      else 1.0).toSeq

  /** Dispatches to the native codegen'd
    * [[graft.functions.AffineProjectExpr]] — one kernel call per row
    * over primitive arrays, vs k·d interpreted lambda dispatches for
    * the HOF chain (which survives as [[projectedComposed]] for the
    * bit-equality property test). Null semantics: a null vector or any
    * null element yields a NULL output row (the HOF form instead
    * emitted per-coordinate nulls; embeddings carry no nulls by
    * contract, and whole-row null is the honest "this input is
    * unusable" answer). */
  private[ops] def projected(vecs: DataFrame, model: PcaModel, k: Int,
                        idCol: String, vecCol: String,
                        whitened: Boolean): DataFrame = {
    val d = model.dim
    require(k >= 1 && k <= d, s"Pca: k=$k outside [1, $d]")
    val expr = graft.functions.AffineProjectExpr(
      org.apache.spark.sql.graft.ColumnShim.expression(col(vecCol)),
      model.mean.toSeq,
      model.components.take(k).flatten.toSeq,
      whitenScales(model, k, whitened))
    vecs.select(col(idCol),
      org.apache.spark.sql.graft.ColumnShim.column(expr).as(vecCol))
  }

  /** The `functions`-composed projection (interpreted HOFs) — reference
    * implementation the native expression is property-tested against,
    * the [[Vectors.cosineComposed]] convention. */
  private[ops] def projectedComposed(vecs: DataFrame, model: PcaModel,
                                     k: Int, idCol: String,
                                     vecCol: String,
                                     whitened: Boolean): DataFrame = {
    val d = model.dim
    require(k >= 1 && k <= d, s"Pca: k=$k outside [1, $d]")
    val muLit = typedlit(model.mean.toSeq)
    // components flattened axis-major: wflat(j*d + i) = components(j)(i)
    val wflat = typedlit(model.components.take(k).flatten.toSeq)
    val scaleLit = typedlit(whitenScales(model, k, whitened))
    vecs.select(col(idCol),
      Exprs.bound(Vectors.toDouble(col(vecCol))) { vd =>
        transform(sequence(lit(0), lit(k - 1)), j =>
          aggregate(
            zip_with(vd, sequence(lit(0), lit(d - 1)), (xi, i) =>
              (xi - element_at(muLit, i + 1)) *
                element_at(wflat, j * lit(d) + i + 1)),
            lit(0.0), (acc, p) => acc + p) * element_at(scaleLit, j + 1))
      }.as(vecCol))
  }
}
