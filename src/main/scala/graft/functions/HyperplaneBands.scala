package graft.functions

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row hyperplane-signature work, shared by eval and codegen. The
  * pseudo-random hyperplane sign for (plane j, dim i) is
  * `xxhash64(j, i) % 2 == 0` — exactly the composed
  * [[Vectors.hyperplaneBandsComposed]] family (Spark's XxHash64 chains
  * `XXH64.hashInt(i, XXH64.hashInt(j, 42L))`) — but hashed ONCE per
  * (plane, dim) into a cached sign table instead of once per (row, plane,
  * dim): the interpreted form evaluates bands×bits×dims xxhash64 calls per
  * ROW, which made LSH banding ~2× brute force at sf0.1.
  *
  * The table is built lazily per executor JVM at the first row's dims and
  * regrown if a longer vector appears; reads are race-free via an
  * immutable (dims, signs) pair in an AtomicReference. */
final class HyperplaneKernel(bands: Int, bitsPerBand: Int)
    extends Serializable {
  private val totalBits = bands * bitsPerBand

  @transient private lazy val table =
    new AtomicReference[(Int, Array[Boolean])]((0, Array.emptyBooleanArray))

  /** Sign table laid out [plane * dims + dim], for at least `dims` dims. */
  private def signsFor(dims: Int): (Int, Array[Boolean]) = {
    val cur = table.get()
    if (cur._1 >= dims) cur
    else {
      val s = new Array[Boolean](totalBits * dims)
      var j = 0
      while (j < totalBits) {
        val hj = XXH64.hashInt(j, 42L)
        var i = 0
        while (i < dims) {
          s(j * dims + i) = XXH64.hashInt(i, hj) % 2 == 0
          i += 1
        }
        j += 1
      }
      val nt = (dims, s)
      val seen = table.get()
      if (seen._1 < dims) table.set(nt)
      nt
    }
  }

  /** The composed form's degenerate output: a null vector or null element
    * nulls every plane sum, and `when(s >= 0, 1).otherwise(0)` sends a
    * null predicate to the otherwise branch — so every band value is 0
    * (never null: the letb-binding `transform` evaluates the body even for
    * a null vector). Shared immutable instance — GenericArrayData is
    * read-only. */
  val zeroBands: ArrayData = new GenericArrayData(new Array[Long](bands))

  /** All `bands` band values in one pass. Bit-equal to the composed form,
    * including the [[zeroBands]] null quirks. */
  def compute(vec: ArrayData, isFloat: Boolean): ArrayData = {
    if (vec == null) return zeroBands
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return zeroBands
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val (dims, signs) = signsFor(n)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var bit = 0
      while (bit < bitsPerBand) {
        val base = (b * bitsPerBand + bit) * dims
        var s = 0.0
        i = 0
        while (i < n) {
          s += (if (signs(base + i)) v(i) else -v(i))
          i += 1
        }
        acc = acc * 2 + (if (s >= 0.0) 1L else 0L)
        bit += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native hyperplane-LSH banding: `bands` band values of `bitsPerBand`
  * sign bits each, over an `array<float|double>` column — the hot kernel
  * of [[graft.ops.Similarity.lshTopK]] and
  * [[graft.ops.Dedup.embeddingPairs]]. One kernel call per row (inside
  * whole-stage codegen) replaces the interpreted nested-HOF form, whose
  * per-(bit,dim) xxhash64 evals dominated banding cost; bit-equality with
  * the composed form is property-tested (HyperplaneBandsSpec). */
case class HyperplaneBandsExpr(child: Expression, bands: Int,
                               bitsPerBand: Int) extends UnaryExpression {

  require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 63,
    s"need 1 <= bitsPerBand($bitsPerBand) <= 63 and bands($bands) >= 1")

  override def prettyName: String = "graft_hyperplane_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got " +
        other.catalogString)
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val kernel = new HyperplaneKernel(bands, bitsPerBand)

  // NOT null-intolerant: the composed family degrades a null vector to the
  // all-zero band array (see HyperplaneKernel.zeroBands), so eval/codegen
  // pass the null through to the kernel instead of short-circuiting.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    kernel.compute(child.eval(input).asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneKernel", kernel,
      classOf[HyperplaneKernel].getName)
    val childGen = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(code =
      code"""
        |${childGen.code}
        |$arrCls ${ev.value} = $ref.compute(
        |  ${childGen.isNull} ? null : ($arrCls) ${childGen.value}, $isFloat);
       """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBandsExpr = copy(child = newChild)
}
