package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row IVF cell probing, shared by eval and codegen: score against
  * every centroid (cosine by default, negated squared-L2 with `useL2` —
  * product quantization MUST assign with the same L2 metric its Lloyd
  * training and ADC tables use, or codes misrank), then the `nProbe` best
  * cell ids by (score desc, cell id desc) — the same tie order the old
  * `greatest`/`array_sort` struct plan produced. Centroids live in DATA
  * (one broadcast-referenced object), not in the plan: the previous shape
  * unrolled one `typedlit` per centroid, so generated-code size grew
  * O(nList·dim) and production nList (thousands) would blow Janino. Here
  * plan size is O(1) in nList.
  */
final class NearestCellsKernel(cellIds: Array[Long],
                               cents: Array[Array[Double]],
                               nProbe: Int,
                               useL2: Boolean) extends Serializable {

  def compute(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val m = cents.length
    val scores = new Array[Double](m)
    var c = 0
    while (c < m) {
      val ct = cents(c)
      if (ct.length != n) scores(c) = Double.NegativeInfinity
      else if (useL2) {
        // negated squared Euclidean distance: argmax(score) == argmin(L2).
        // No normalization — zero-norm vectors are ordinary points here.
        var d2 = 0.0
        var k = 0
        while (k < n) {
          val d = v(k) - ct(k); d2 += d * d
          k += 1
        }
        scores(c) = -d2
      } else {
        var dot = 0.0; var nx = 0.0; var ny = 0.0
        var k = 0
        while (k < n) {
          dot += v(k) * ct(k); nx += v(k) * v(k); ny += ct(k) * ct(k)
          k += 1
        }
        val den = math.sqrt(nx) * math.sqrt(ny)
        scores(c) = if (den == 0.0) Double.NegativeInfinity else dot / den
      }
      c += 1
    }
    val p = math.min(nProbe, m)
    val out = new Array[Long](p)
    if (p <= 16) {
      // partial selection: O(m·p), no per-row sort allocation
      val taken = new Array[Boolean](m)
      var r = 0
      while (r < p) {
        var best = -1
        c = 0
        while (c < m) {
          if (!taken(c) && (best < 0 || scores(c) > scores(best) ||
              (scores(c) == scores(best) && cellIds(c) > cellIds(best))))
            best = c
          c += 1
        }
        taken(best) = true
        out(r) = cellIds(best)
        r += 1
      }
    } else {
      val idx = Array.range(0, m).sortWith { (a, b) =>
        scores(a) > scores(b) ||
          (scores(a) == scores(b) && cellIds(a) > cellIds(b))
      }
      var r = 0
      while (r < p) { out(r) = cellIds(idx(r)); r += 1 }
    }
    new GenericArrayData(out)
  }
}

/** Native IVF cell-probe expression: `array<long>` of the `nProbe` best
  * cell ids for an `array<float|double>` vector — `nProbe = 1` is the
  * corpus-side assignment argmax, `nProbe = k` the query-side probe list.
  * See [[NearestCellsKernel]] for why centroids are a reference object
  * rather than plan literals. */
case class NearestCells(child: Expression, cellIds: Seq[Long],
                        centroids: Seq[Seq[Double]],
                        nProbe: Int,
                        useL2: Boolean = false) extends UnaryExpression {

  require(cellIds.length == centroids.length && centroids.nonEmpty,
    "cellIds and centroids must align and be non-empty")
  require(nProbe >= 1, s"need nProbe($nProbe) >= 1")

  override def prettyName: String = "graft_nearest_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got " +
        other.catalogString)
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val kernel =
    new NearestCellsKernel(cellIds.toArray, centroids.map(_.toArray).toArray,
      nProbe, useL2)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellsKernel", kernel,
      classOf[NearestCellsKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = $ref.compute($a, $isFloat);
      |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(
      newChild: Expression): NearestCells = copy(child = newChild)
}
