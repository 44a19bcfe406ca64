package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row Hilbert-index work shared by eval and codegen: mask each
  * coordinate to `bits` low bits (the documented truncation contract —
  * the former UDF silently relied on the transform ignoring high bits),
  * then run Skilling's axes→transpose walk
  * ([[graft.ops.Layout.hilbertScalar]]). A null coordinate yields a
  * null code — the [[graft.ops.Layout.mortonCodeN]] null semantics, so
  * the sibling curves agree (the boxed-UDF form it replaces unboxed a
  * null element to 0 instead). */
final class HilbertCodeKernel(bits: Int) extends Serializable {
  private val mask = (1L << bits) - 1L

  /** Returns the boxed code, or null when the array or any element is
    * null. One box per row — noise next to the per-row transform; the
    * nullable result is what keeps the sibling-curve null contract. */
  def compute(arr: ArrayData): java.lang.Long = {
    if (arr == null) return null
    val n = arr.numElements()
    require(n >= 2 && n * bits <= 63,
      s"hilbert code needs 2 <= n and n*bits <= 63, got n=$n bits=$bits")
    val coords = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      coords(i) = arr.getLong(i) & mask
      i += 1
    }
    java.lang.Long.valueOf(graft.ops.Layout.hilbertScalar(coords, bits))
  }
}

/** Native Hilbert-curve index of an `array<long>` of coordinates — the
  * codegen'd replacement for the boxed `Seq[Long] => Long` UDF the
  * layout rewrite used (one Scala collection conversion + lambda
  * dispatch per row, and a `ScalaUDF` node that fences whole-stage
  * codegen). Same [[ShingleKernel]] discipline: the kernel is
  * `addReferenceObj`'d and both eval and the generated code make one
  * scalar call per row. Bit-equality with
  * [[graft.ops.Layout.hilbertScalar]] is property-tested (LayoutSpec). */
case class HilbertCodeExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")

  override def prettyName: String = "graft_hilbert_code"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new HilbertCodeKernel(bits)

  override def eval(input: InternalRow): Any = {
    val v = kernel.compute(child.eval(input).asInstanceOf[ArrayData])
    if (v == null) null else v.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertKernel", kernel,
      classOf[HilbertCodeKernel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("hilbertBoxed")
      s"""
         |java.lang.Long $boxed = $ref.compute($c);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HilbertCodeExpr = copy(child = newChild)
}
