package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row repetition-metrics work shared by eval and codegen: normalize
  * (the exact pipeline of `TextAnalysis.normalized`), split on single
  * spaces, then word/bigram distinct counts and the max word frequency in
  * ONE hash pass — instead of the composed chain's interpreted
  * split + array_distinct + transform + aggregate HOFs per row.
  *
  * Bit-equality with `TextAnalysis.repetitionMetricsComposed` is
  * property-tested (RepetitionStatsSpec) for non-null text: identical
  * divisions in identical order, and rounding via the same
  * canonical-string BigDecimal HALF_UP that Spark's `round` applies to
  * doubles. (The composed max-word-frequency is the longest equal-run of
  * the SORTED word array — equal elements are adjacent after any total
  * order, so it equals the max hash-counted frequency computed here.) */
final class RepetitionKernel extends Serializable {
  @transient private lazy val ws = Pattern.compile("\\s+")
  private val space = UTF8String.fromString(" ")

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  def compute(text: UTF8String): GenericInternalRow = {
    if (text == null) return null
    val replaced = UTF8String.fromString(
      ws.matcher(text.toString).replaceAll(" "))
    val norm = replaced.trim().toLowerCase()
    val words = norm.split(space, -1)
    val n = words.length
    val freq = new java.util.HashMap[UTF8String, Integer]()
    var maxF = 0
    var i = 0
    while (i < n) {
      val c = freq.getOrDefault(words(i), 0) + 1
      freq.put(words(i), c)
      if (c > maxF) maxF = c
      i += 1
    }
    val dupWord = (n - freq.size).toDouble / n
    var dupBigram = 0.0
    if (n >= 2) {
      val bigrams = new java.util.HashSet[UTF8String]()
      var j = 0
      while (j < n - 1) {
        bigrams.add(UTF8String.concat(words(j), space, words(j + 1)))
        j += 1
      }
      val nb = n - 1
      dupBigram = (nb - bigrams.size).toDouble / nb
    }
    new GenericInternalRow(Array[Any](n, round4(dupWord),
      round4(dupBigram), round4(maxF.toDouble / n)))
  }
}

/** Native repetition quality signals over a string column: one compiled
  * pass returning `struct<n_words int, dup_word_frac double,
  * dup_bigram_frac double, max_word_freq_frac double>`.
  * See [[RepetitionKernel]]. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_repetition_stats"

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("dup_bigram_frac", DoubleType, nullable = false),
    StructField("max_word_freq_frac", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new RepetitionKernel

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionKernel", kernel,
      classOf[RepetitionKernel].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStatsExpr = copy(child = newChild)
}
