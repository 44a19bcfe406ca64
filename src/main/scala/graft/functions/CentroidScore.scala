package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid argmin shared by eval and codegen — the
  * [[graft.ops.Similarity.centroidClassify]] scoring rule, replicated
  * operation-for-operation from the HOF chain it replaces so the native
  * result is BIT-IDENTICAL (property-tested in SimilaritySpec):
  *
  *   q_i   = (long) floor(x_i · scale)            // saturating cast,
  *                                                // Spark double→long
  *   dd(l) = Σ_i (n_l·q_i − s_{l,i})²             // BIGINT, wrapping —
  *                                                // Java long ≡ Spark
  *                                                // non-ANSI
  *   cost  = (double) dd(l) / (double)(n_l·n_l)
  *   pick  = lexicographic min of (cost, label)   // java.lang.Double
  *                                                // .compare — Spark's
  *                                                // struct/array_sort
  *                                                // double order
  *
  * A null array, or ANY null element, yields a null result (whole-row
  * null, the [[AffineProjectKernel]] convention — the HOF form's
  * per-coordinate null poisoning differs only on inputs the embedding
  * contract already excludes; documented at the dispatch site). */
final class CentroidScoreKernel(labels0: Seq[Int], counts0: Seq[Long],
                                sFlat0: Seq[Long], scale: Long,
                                floatInput: Boolean)
    extends Serializable {
  private val labels = labels0.toArray
  private val counts = counts0.toArray
  private val sFlat = sFlat0.toArray
  private val L = labels.length
  require(L > 0, "centroid score needs at least one label")
  require(counts.length == L,
    s"counts must align with labels: ${counts.length} vs $L")
  require(sFlat.length % L == 0,
    s"sFlat length ${sFlat.length} must be a multiple of label count $L")
  private val d = sFlat.length / L

  def compute(arr: ArrayData): Any = {
    if (arr == null) return null
    require(arr.numElements() == d,
      s"centroid score expects $d-dim vectors, got ${arr.numElements()}")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      val x = if (floatInput) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = java.lang.Math.floor(x * scale).toLong
      i += 1
    }
    var bestCost = Double.NaN
    var bestLab = 0
    var first = true
    var l = 0
    while (l < L) {
      val n = counts(l)
      val base = l * d
      var dd = 0L
      var t = 0
      while (t < d) {
        val dev = n * q(t) - sFlat(base + t)
        dd += dev * dev
        t += 1
      }
      val cost = dd.toDouble / (n * n).toDouble
      val lab = labels(l)
      val better = first || {
        val c = java.lang.Double.compare(cost, bestCost)
        c < 0 || (c == 0 && lab < bestLab)
      }
      if (better) { bestCost = cost; bestLab = lab; first = false }
      l += 1
    }
    bestLab
  }
}

/** Native nearest-centroid classification of an embedding column — the
  * codegen'd replacement for the `transform(sequence, aggregate(
  * zip_with(...)))` HOF chain (higher-order functions evaluate
  * INTERPRETED per element in Spark: L·d lambda dispatches and
  * `element_at` literal probes per row, where this is one kernel call
  * over primitive arrays). Same [[AffineProjectExpr]] discipline:
  * centroid sums/counts ride as ONE `addReferenceObj` reference, eval
  * and generated code share the kernel, plan/generated-code size is
  * O(1) in L·d. */
// params as Seq (not Array): case-class equality stays structural, so
// plan canonicalization / subexpression elimination keep working
case class CentroidScoreExpr(child: Expression, labels: Seq[Int],
                             counts: Seq[Long], sFlat: Seq[Long],
                             scale: Long)
    extends UnaryExpression {

  override def prettyName: String = "graft_centroid_score"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new CentroidScoreKernel(
    labels, counts, sFlat, scale,
    floatInput = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })

  override def eval(input: InternalRow): Any =
    kernel.compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidKernel", kernel,
      classOf[CentroidScoreKernel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("centroidOut")
      s"""
         |Object $out = $ref.compute($c);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Integer) $out).intValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): CentroidScoreExpr = copy(child = newChild)
}
