package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries, "Finding repeated
  * elements", Sci. Comput. Program. 2, 1982) as a NATIVE
  * `TypedImperativeAggregate` — the bounded-memory answer to "which
  * values dominate this column" when the domain is unbounded (tokens,
  * URLs, user agents) and an exact groupBy-count would carry the whole
  * domain through the shuffle. Native (the [[TopKRowsAgg]] discipline,
  * not a typed-udaf Aggregator) because the INPUT here is the raw
  * corpus stream — the hottest row count in the pipeline — and the
  * udaf's per-row encoder round-trip measured ~60× a native aggregate
  * on exactly that shape (the topKPerQuery probe).
  *
  * Summary state is ≤ k counters. Stream step: increment a held item,
  * adopt into a free slot, else decrement ALL counters (conceptually —
  * implemented as a batched subtraction) and drop zeros. Merge (what
  * makes it run as ObjectHashAggregate with map-side partials —
  * Agarwal et al., "Mergeable summaries", PODS 2012): sum the two
  * counter maps, then subtract the (k+1)-th largest count from every
  * survivor and drop non-positives — the merged summary keeps the MG
  * guarantee over the combined stream.
  *
  * Guarantees (machine-checked in the gates, partitioning-INDEPENDENT
  * even though the estimates themselves can vary with merge order):
  *  - `est ≤ true count` (never over-counts);
  *  - `true count − est ≤ n/(k+1)`;
  *  - every item with true count > n/(k+1) is PRESENT in the summary.
  *
  * Output: `array<struct<item, est>>` sorted (est desc, item asc) — a
  * deterministic display order for whatever counter SET the merge
  * order produced. Null inputs are skipped. */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.Map[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"heavy-hitters summary needs k >= 1, got $k")

  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${other.catalogString}")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = MisraGriesAgg.OutType

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.Map.empty[String, Long]

  /** Subtract the smallest surviving count needed to bring the map back
    * to ≤ k entries: the (k+1)-th largest value, MG's batched
    * decrement. */
  private def compact(b: mutable.Map[String, Long])
      : mutable.Map[String, Long] = {
    if (b.size <= k) b
    else {
      val cut = b.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      b.iterator
        .collect { case (i, c) if c > cut => i -> (c - cut) }
        .to(mutable.Map)
    }
  }

  override def update(b: mutable.Map[String, Long],
                      input: InternalRow): mutable.Map[String, Long] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      // toString copies out of the (reused) UTF8String backing bytes
      val item = v.asInstanceOf[UTF8String].toString
      b.updateWith(item) {
        case Some(c) => Some(c + 1)
        case None => Some(1L)
      }
      if (b.size > k) compact(b) else b
    }
  }

  override def merge(x: mutable.Map[String, Long],
                     y: mutable.Map[String, Long])
      : mutable.Map[String, Long] = {
    y.foreach { case (i, c) =>
      x.updateWith(i) {
        case Some(c0) => Some(c0 + c)
        case None => Some(c)
      }
    }
    compact(x)
  }

  private def toArrayData(b: mutable.Map[String, Long]): GenericArrayData =
    new GenericArrayData(b.toArray
      .sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) =>
        InternalRow(UTF8String.fromString(i), c): Any
      })

  override def eval(b: mutable.Map[String, Long]): Any = toArrayData(b)

  // the Collect-aggregate serialization pattern (see TopKRowsAgg): one
  // UnsafeRow holding the counters as an array value; projection cached
  // per task instance
  @transient private lazy val bufferProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(b: mutable.Map[String, Long]): Array[Byte] =
    bufferProjection(InternalRow(toArrayData(b))).getBytes

  override def deserialize(bytes: Array[Byte])
      : mutable.Map[String, Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val array = row.getArray(0)
    val b = mutable.Map.empty[String, Long]
    var i = 0
    while (i < array.numElements()) {
      val r = array.getStruct(i, 2)
      b.put(r.getUTF8String(0).toString, r.getLong(1))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = n)

  override def withNewInputAggBufferOffset(n: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = n)

  override protected def withNewChildInternal(
      newChild: Expression): MisraGriesAgg = copy(child = newChild)
}

object MisraGriesAgg {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))),
    containsNull = false)

  /** Aggregate column: the ≤ k-counter MG summary of a string column,
    * sorted (est desc, item asc). */
  def misraGries(e: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(
      MisraGriesAgg(ColumnShim.expression(e), k).toAggregateExpression())
  }
}
