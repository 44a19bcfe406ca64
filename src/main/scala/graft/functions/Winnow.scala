package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row winnowing work shared by eval and codegen: normalize (the
  * exact pipeline of `TextAnalysis.normalized`), hash every k-char gram
  * (same `substr` character semantics and seed-42 XXH64 as the composed
  * `xxhash64(t.substr(i, k))`), then select each w-window's minimum with
  * a MONOTONIC DEQUE — O(1) amortized per gram instead of the composed
  * form's O(w) `slice`+`array_min` per window — and emit the sorted
  * distinct selection.
  *
  * Bit-equality with the composed `TextAnalysis
  * .winnowFingerprintsComposed` is property-tested (WinnowSpec) for
  * non-null input. Null input returns null (the composed HOF chain
  * degrades a null text to `[null]` through the `size(null) = -1`
  * legacy quirk — an accident this kernel does not reproduce). */
final class WinnowKernel(k: Int, w: Int) extends Serializable {
  @transient private lazy val ws = Pattern.compile("\\s+")
  private val seed = 42L

  def compute(text: UTF8String): ArrayData = {
    if (text == null) return null
    val replaced = UTF8String.fromString(
      ws.matcher(text.toString).replaceAll(" "))
    val norm = replaced.trim().toLowerCase()
    val nGrams = norm.numChars() - (k - 1)
    if (nGrams < 1)
      return new GenericArrayData(Array(XXH64.hashUTF8String(norm, seed)))
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = XXH64.hashUTF8String(norm.substringSQL(i + 1, k), seed)
      i += 1
    }
    val nWins = nGrams - (w - 1)
    val sel: Array[Long] =
      if (nWins < 1) {
        var mn = grams(0)
        var j = 1
        while (j < nGrams) { if (grams(j) < mn) mn = grams(j); j += 1 }
        Array(mn)
      } else {
        val out = new Array[Long](nWins)
        val dq = new Array[Int](nGrams)
        var head = 0
        var tail = 0 // live window indices in dq[head, tail), grams ascending
        var j = 0
        while (j < nGrams) {
          while (tail > head && grams(dq(tail - 1)) >= grams(j)) tail -= 1
          dq(tail) = j
          tail += 1
          if (dq(head) <= j - w) head += 1
          if (j >= w - 1) out(j - (w - 1)) = grams(dq(head))
          j += 1
        }
        out
      }
    // sorted distinct (array_sort(array_distinct(...)))
    java.util.Arrays.sort(sel)
    var wr = 0
    var rd = 0
    while (rd < sel.length) {
      if (rd == 0 || sel(rd) != sel(rd - 1)) { sel(wr) = sel(rd); wr += 1 }
      rd += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sel, wr))
  }
}

/** Native winnowing fingerprints over a string column: sorted distinct
  * `array<long>` of window-minimum k-gram hashes. See [[WinnowKernel]]. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"need k($k) >= 1 and w($w) >= 1")

  override def prettyName: String = "graft_winnow"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new WinnowKernel(k, w)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowKernel", kernel,
      classOf[WinnowKernel].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowExpr = copy(child = newChild)
}
