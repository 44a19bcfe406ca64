package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns, built from
  * codegen'd higher-order functions (`zip_with` / `aggregate`) — no UDFs,
  * so the hot similarity paths stay inside whole-stage codegen.
  */
object Vectors {

  /** Elementwise cast to double (float arrays from parquet). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (null, not error).
    * Dispatches to the native codegen'd [[CosineSimilarity]] expression
    * (bit-identical to the composed `aggregate(zip_with(...))` form, which
    * survives as [[cosineComposed]] for cross-checking). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      CosineSimilarity(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** The `functions`-composed cosine (interpreted HOFs) — reference
    * implementation the native expression is property-tested against. */
  def cosineComposed(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    dot(ad, bd) / nullif(norm(ad) * norm(bd), lit(0.0))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Random-hyperplane band values: `bands` buckets of `bitsPerBand` sign
    * bits each (plane index = band·bitsPerBand + bit, so bands are
    * independent). Returns `array<long>` of length `bands` — the LSH
    * banding substrate for embedding near-dup and ANN: two vectors are
    * candidates iff some band value matches. Hyperplane weights derive
    * from xxhash64(planeIndex, dimIndex) mapped to ±1 — deterministic
    * across runs and executors, no RNG state to ship.
    *
    * Dispatches to the native codegen'd [[HyperplaneBandsExpr]] (sign
    * table hashed once per executor, one kernel call per row); the
    * interpreted HOF form survives as [[hyperplaneBandsComposed]] for
    * property-testing bit-equality. */
  def hyperplaneBands(vec: Column, bands: Int, bitsPerBand: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      HyperplaneBandsExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(vec),
        bands, bitsPerBand))

  /** The `functions`-composed band family (interpreted HOFs; evaluates an
    * xxhash64 per (row, plane, dim)) — reference implementation the native
    * expression is property-tested against. */
  def hyperplaneBandsComposed(vec: Column, bands: Int,
                              bitsPerBand: Int): Column =
    Exprs.bound(toDouble(vec)) { vd =>
      transform(sequence(lit(0), lit(bands - 1)), b =>
        aggregate(
          sequence(b * bitsPerBand, (b + 1) * bitsPerBand - 1),
          lit(0L),
          (acc, j) => {
            val s = aggregate(
              zip_with(vd, sequence(lit(0), size(vd) - 1),
                (v, i) => when(xxhash64(j, i) % 2 === 0, v).otherwise(-v)),
              lit(0.0), (a, v) => a + v)
            acc * 2 + when(s >= 0, 1L).otherwise(0L)
          }))
    }
}
