package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row affine projection shared by eval and codegen:
  * `out(j) = (Σ_i (x_i − mean_i) · w(j·d + i)) · scale_j` — the
  * PCA-projection / whitening kernel. The fold runs i = 0..d−1 in
  * order from 0.0, exactly the `aggregate(zip_with(...))` evaluation
  * order, so the native result is BIT-IDENTICAL to the HOF form it
  * replaces (property-tested in PcaSpec). Float elements widen to
  * double (exact). A null array, or any null element, yields a null
  * result — one whole-row semantics instead of the HOF's per-
  * coordinate null, documented at the dispatch site. */
final class AffineProjectKernel(mean0: Seq[Double], wFlat0: Seq[Double],
                                scale0: Seq[Double], floatInput: Boolean)
    extends Serializable {
  private val mean = mean0.toArray
  private val wFlat = wFlat0.toArray
  private val scale = scale0.toArray
  private val d = mean.length
  private val k = scale.length
  require(wFlat.length == d * k,
    s"weight matrix must be k*d = ${k * d} long, got ${wFlat.length}")

  def compute(arr: ArrayData): ArrayData = {
    if (arr == null) return null
    require(arr.numElements() == d,
      s"affine projection expects $d-dim vectors, got ${arr.numElements()}")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return null
      x(i) = if (floatInput) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val base = j * d
      var s = 0.0
      var t = 0
      while (t < d) {
        s += (x(t) - mean(t)) * wFlat(base + t)
        t += 1
      }
      out(j) = s * scale(j)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native affine projection of an embedding column — the codegen'd
  * replacement for the nested `transform(sequence, aggregate(zip_with))`
  * HOF chain [[graft.ops.Pca]] projection used (higher-order functions
  * evaluate INTERPRETED per element in Spark: k·d lambda dispatches and
  * `element_at` probes per row, where this is one kernel call over
  * primitive arrays). Same [[ShingleKernel]]/[[HilbertCodeExpr]]
  * discipline: matrices ride as ONE `addReferenceObj` reference, eval
  * and generated code share the kernel, plan/generated-code size is
  * O(1) in k·d. */
// matrices as Seq (not Array): case-class equality stays structural, so
// plan canonicalization / subexpression elimination keep working
case class AffineProjectExpr(child: Expression, mean: Seq[Double],
                             wFlat: Seq[Double], scale: Seq[Double])
    extends UnaryExpression {

  override def prettyName: String = "graft_affine_project"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new AffineProjectKernel(
    mean, wFlat, scale,
    floatInput = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })

  override def eval(input: InternalRow): Any =
    kernel.compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affineKernel", kernel,
      classOf[AffineProjectKernel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("affineOut")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  $ref.compute($c);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): AffineProjectExpr = copy(child = newChild)
}
