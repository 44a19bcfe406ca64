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

  /** Deterministic random-hyperplane signature: `bits` sign bits, one per
    * pseudo-random hyperplane. Hyperplane weights are derived from
    * xxhash64(bitIndex, dimIndex) mapped to ±1 — fully deterministic across
    * runs and executors (no RNG state to ship). Used by SimHash-style
    * embedding LSH (near-dup + ANN bucketing).
    */
  def hyperplaneSignature(vec: Column, bits: Int): Column =
    Exprs.bound(toDouble(vec)) { vd =>
      // bit j set iff sum_i(sign(hash(j,i)) * v_i) >= 0; vd is let-bound so
      // the elementwise double cast runs once, not once per bit
      val bitCols = transform(sequence(lit(0), lit(bits - 1)), j => {
        val s = aggregate(
          zip_with(vd, sequence(lit(0), size(vd) - 1),
            (v, i) => when(xxhash64(j, i) % 2 === 0, v).otherwise(-v)),
          lit(0.0), (acc, v) => acc + v)
        when(s >= 0, lit(1)).otherwise(lit(0))
      })
      // pack to a long
      aggregate(bitCols, lit(0L), (acc, b) => acc * 2 + b)
    }

  /** Random-hyperplane band values: `bands` buckets of `bitsPerBand` sign
    * bits each (plane index = band·bitsPerBand + bit, so bands are
    * independent). Returns `array<long>` of length `bands` — the LSH
    * banding substrate for embedding near-dup and ANN: two vectors are
    * candidates iff some band value matches. Like [[hyperplaneSignature]]
    * but not capped at 64 total bits. */
  def hyperplaneBands(vec: Column, bands: Int, bitsPerBand: Int): Column =
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
