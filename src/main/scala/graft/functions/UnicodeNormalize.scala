package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization kernel (NFC/NFD/NFKC/NFKD via
  * `java.text.Normalizer`). Fast path: `isNormalized` is a scan without
  * allocation — for the dominant already-normalized case (all-ASCII web
  * text trivially qualifies) the input UTF8String is returned as-is, no
  * String round-trip. */
final class UnicodeNormalizeKernel(formName: String) extends Serializable {
  @transient private lazy val form = Normalizer.Form.valueOf(formName)

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** Native codegen'd Unicode normalization of a string column — the
  * canonicalization step a text pipeline runs BEFORE tokenization or
  * fingerprinting (decomposed "e +  ́" and precomposed "é" must dedupe and
  * tokenize identically; NFKC additionally folds compatibility forms —
  * fullwidth digits, ligatures — the way GPT-2/BERT-style preprocessing
  * does). A UDF here would force every corpus row through an extra
  * serialization hop; the expression stays inside whole-stage codegen
  * with a zero-copy pass-through for already-normalized rows. */
case class UnicodeNormalizeExpr(child: Expression, formName: String)
    extends UnaryExpression {

  override def prettyName: String = "graft_unicode_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new UnicodeNormalizeKernel(formName)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unicodeNormKernel", kernel,
      classOf[UnicodeNormalizeKernel].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalizeExpr = copy(child = newChild)
}
