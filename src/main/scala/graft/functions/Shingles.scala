package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row shingling work shared by eval and codegen: normalize (collapse
  * whitespace → trim → lowercase, the exact op order and UTF8String code
  * paths of `TextAnalysis.normalized`), split on single spaces, hash each
  * word n-gram with the same seed-chained XXH64 the composed
  * `xxhash64(w1..wn)` uses, then distinct + ascending sort.
  *
  * The composed form is a nested higher-order-function chain — interpreted,
  * one lambda allocation per word — and sat at the head of both dedup
  * pipelines (the r3 fix already hashed shingles off the word array; this
  * compiles the remaining interpreter loop away). Bit-equality with the
  * composed form is property-tested (ShinglesSpec). */
final class ShingleKernel(n: Int) extends Serializable {
  @transient private lazy val ws = Pattern.compile("\\s+")
  private val seed = 42L

  private def chainHash(words: Array[UTF8String], from: Int,
                        len: Int): Long = {
    var h = seed
    var j = 0
    while (j < len) {
      h = XXH64.hashUTF8String(words(from + j), h)
      j += 1
    }
    h
  }

  /** Composed-form null quirk: `size(null)` is -1 (legacy default), so
    * `when(count < n, array(xxhash64(words)))` takes the short branch and
    * `xxhash64(null)` skips its null child — a null text degrades to the
    * one-element array [seed], never to null. */
  private val nullResult: ArrayData = new GenericArrayData(Array(seed))

  def compute(text: UTF8String): ArrayData = {
    if (text == null) return nullResult
    // same pipeline as lower(trim(regexp_replace(text, "\s+", " "))):
    // java-regex replace, UTF8String.trim (spaces only), UTF8String lower
    val replaced = UTF8String.fromString(
      ws.matcher(text.toString).replaceAll(" "))
    val norm = replaced.trim().toLowerCase()
    val words = norm.split(UTF8String.fromString(" "), -1)
    val m = words.length
    val hashes: Array[Long] =
      if (m < n) Array(chainHash(words, 0, m))
      else {
        val out = new Array[Long](m - n + 1)
        var i = 0
        while (i <= m - n) {
          out(i) = chainHash(words, i, n)
          i += 1
        }
        out
      }
    // distinct + ascending sort (array_sort(array_distinct(...)))
    java.util.Arrays.sort(hashes)
    var w = 0
    var r = 0
    while (r < hashes.length) {
      if (r == 0 || hashes(r) != hashes(r - 1)) {
        hashes(w) = hashes(r); w += 1
      }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

/** Native word-n-gram shingle hashing: `array<long>` of sorted distinct
  * shingle hashes for a string column. See [[ShingleKernel]]. */
case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"need n($n) >= 1")

  override def prettyName: String = "graft_word_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new ShingleKernel(n)

  // NOT null-intolerant: the composed family degrades a null text to the
  // one-element [seed] array (see ShingleKernel.nullResult), so eval and
  // codegen pass the null through to the kernel.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    kernel.compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleKernel", kernel,
      classOf[ShingleKernel].getName)
    val childGen = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    val strCls = classOf[UTF8String].getName
    ev.copy(code =
      code"""
        |${childGen.code}
        |$arrCls ${ev.value} = $ref.compute(
        |  ${childGen.isNull} ? null : ($strCls) ${childGen.value});
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordShingleHashesExpr = copy(child = newChild)
}

/** Per-row word n-gram STRING materialization (the countable face of
  * [[ShingleKernel]], which only ever emits hashes): same normalize +
  * single-space split pipeline, then every positional n-gram joined with
  * a single space — WITH multiplicity and in document order, because the
  * consumer is a frequency count, not a set. The composed
  * `transform(sequence(...), i => concat_ws(...element_at...))` form this
  * replaces is an interpreted HOF whose shared word-array child gets
  * collapsed back INTO the lambda by CollapseProject and re-split per
  * gram (measured 42µs/gram on the t_ngram_counts corpus — the whole
  * document re-normalized n times per row). */
final class NgramKernel(n: Int) extends Serializable {
  @transient private lazy val ws = Pattern.compile("\\s+")
  private val empty: ArrayData = new GenericArrayData(new Array[AnyRef](0))
  private val sep = UTF8String.fromString(" ")

  def compute(text: UTF8String): ArrayData = {
    if (text == null) return empty
    val replaced = UTF8String.fromString(
      ws.matcher(text.toString).replaceAll(" "))
    val norm = replaced.trim().toLowerCase()
    if (norm.numBytes() == 0) return empty
    val words = norm.split(sep, -1)
    val m = words.length
    if (m < n) return empty
    val out = new Array[AnyRef](m - n + 1)
    var i = 0
    while (i <= m - n) {
      out(i) = UTF8String.concatWs(sep,
        java.util.Arrays.copyOfRange(words, i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native word n-gram strings: `array<string>` of the positional n-grams
  * of a string column, document order, with multiplicity. See
  * [[NgramKernel]]. */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"need n($n) >= 1")

  override def prettyName: String = "graft_word_ngrams"
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new NgramKernel(n)

  // a null text degrades to the empty gram array (it has no grams), so
  // the null passes through to the kernel rather than short-circuiting
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    kernel.compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramKernel", kernel,
      classOf[NgramKernel].getName)
    val childGen = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    val strCls = classOf[UTF8String].getName
    ev.copy(code =
      code"""
        |${childGen.code}
        |$arrCls ${ev.value} = $ref.compute(
        |  ${childGen.isNull} ? null : ($strCls) ${childGen.value});
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordNgramsExpr = copy(child = newChild)
}

/** Per-row MinHash signature work: Carter–Wegman double hashing exactly as
  * the composed `Dedup.minHashSignature` family — h1(s) = xxhash64(s),
  * h2(s) = xxhash64(s, 1) (a LONG hash chained with an INT literal hash,
  * matching the composed expression's types), member i = min over shingles
  * of h1 + i·h2 with wrapping long arithmetic. One compiled loop replaces
  * numHashes nested interpreted lambdas per row. */
final class MinHashKernel(numHashes: Int) extends Serializable {
  private val seed = 42L

  def compute(shingles: ArrayData): ArrayData = {
    if (shingles == null) return null
    val m = shingles.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < m) {
      // composed xxhash64 skips null children (hash unchanged)
      val h1 =
        if (shingles.isNullAt(i)) seed
        else XXH64.hashLong(shingles.getLong(i), seed)
      val h2 = XXH64.hashInt(1, h1)
      any = true
      var k = 0
      var v = h1
      while (k < numHashes) {
        if (v < mins(k)) mins(k) = v
        v += h2 // h1 + k*h2, incrementally
        k += 1
      }
      i += 1
    }
    if (!any) return new GenericArrayData(new Array[AnyRef](numHashes))
    new GenericArrayData(mins)
  }
}

/** Native MinHash signature over an `array<long>` shingle-hash column:
  * `array<long>` of `numHashes` family minima. See [[MinHashKernel]]. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, s"need numHashes($numHashes) >= 1")

  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new MinHashKernel(numHashes)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashKernel", kernel,
      classOf[MinHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)
}
