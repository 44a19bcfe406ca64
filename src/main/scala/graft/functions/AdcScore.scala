package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row ADC work shared by eval and codegen: M table lookups summed
  * left-to-right, mirroring the composed
  * `aggregate(zip_with(codes, dtab, (c, t) -> element_at(t, c + 1)), 0d, +)`
  * bit-for-bit on encoder-shaped input — null on null input, length
  * mismatch (zip_with padding), out-of-range code, or null table cell;
  * never an error. (Divergence: `element_at`'s negative-index
  * wrap-around is NOT reproduced — codes are codeword indices and never
  * negative by construction; a negative code is null here.) */
final class AdcKernel extends Serializable {
  def compute(codes: ArrayData, dtab: ArrayData): Any = {
    if (codes == null || dtab == null) return null
    val m = codes.numElements()
    if (m != dtab.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i) || dtab.isNullAt(i)) return null
      val t = dtab.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= t.numElements() || t.isNullAt(c)) return null
      s += t.getDouble(c)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Native asymmetric-distance score: `codes` (`array<int>`, one codeword
  * index per subspace) against a query's broadcast distance table
  * (`array<array<double>>`). This is the inner loop of PQ/IVFADC
  * candidate scoring — the composed HOF form is interpreted
  * (CodegenFallback) and would drop the post-join scoring projection out
  * of whole-stage codegen exactly where a 100 TB corpus pays for it. */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_adc_score"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
    right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<double>>), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  @transient private lazy val kernel = new AdcKernel

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcKernel", kernel,
      classOf[AdcKernel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("adcResult")
      s"""
         |Object $r = $ref.compute($a, $b);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $r).doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}
