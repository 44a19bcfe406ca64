package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-row SimHash voting over 64-bit shingle HASHES (the
  * [[WordShingleHashesExpr]] substrate the whole dedup family runs on —
  * the hashes are already xxhash64 outputs, so re-hashing them buys
  * nothing): ±1 votes per bit position of each hash, then sign-packing
  * with votes[0] landing in the MSB — the `shiftleft(acc,1)|sign` left
  * fold of the composed form. Empty input → all-zero votes → every sign
  * bit set → -1L; a NULL element contributes the engine seed (42),
  * matching composed xxhash64's skip-null-children value.
  *
  * The composed form is an `aggregate` HOF allocating a 64-element vote
  * array PER SHINGLE per row (zip_with + array literals, interpreted) —
  * it sat at the head of the SimHash pair pipeline, where the fingerprint
  * is computed over corpus + planted twins. One compiled two-level loop
  * replaces it; bit-equality is property-tested (SimHashSpec). */
final class SimHashKernel extends Serializable {
  private val seed = 42L

  def compute(shingles: ArrayData): Long = {
    val m = shingles.numElements()
    val votes = new Array[Long](64)
    var i = 0
    while (i < m) {
      val h = if (shingles.isNullAt(i)) seed else shingles.getLong(i)
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < 64) {
      acc = (acc << 1) | (if (votes(j) >= 0L) 1L else 0L)
      j += 1
    }
    acc
  }
}

/** Native 64-bit SimHash fingerprint over an `array<long>` shingle-hash
  * column. See [[SimHashKernel]]. */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new SimHashKernel

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashKernel", kernel,
      classOf[SimHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpr = copy(child = newChild)
}
