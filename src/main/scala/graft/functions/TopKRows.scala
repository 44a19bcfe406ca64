package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded top-k ROWS per group as a native Catalyst aggregate — the
  * generic, untyped successor of the typed-udaf Aggregator heaps this
  * repo once carried (retired after a 512M-row probe measured their
  * per-row encoder round-trip at ~60× this aggregate): give it any
  * ORDERABLE struct and it keeps the k smallest (or largest) under the
  * struct's lexicographic field order.
  *
  * This replaces the `row_number().over(Window.partitionBy(g))` + `rank
  * <= k` idiom, whose exchange funnels EVERY row of a group through the
  * single task that owns the group and sorts it all. As a
  * `TypedImperativeAggregate` this runs inside ObjectHashAggregate with
  * map-side partial aggregation: each input task reduces its slice to
  * ≤ k rows per group locally, so only k-row buffers cross the shuffle —
  * at 100 TB the exchange carries `groups × k` rows, not the corpus.
  *
  * Buffer policy: append-only until 4k
  * entries, then sort+truncate to k — amortized O(log k) per row, exact
  * result. Determinism: callers put the tie-breaking columns in the
  * struct; a struct that is a total order (e.g. ends in a unique key)
  * makes the result partitioning-independent. Serialization follows
  * Spark's own `Collect` aggregate: the buffer round-trips as one
  * UnsafeRow-encoded array.
  */
case class TopKRowsAgg(
    child: Expression,
    k: Int,
    ascending: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"topKRows needs a positive k, got $k")

  @transient private lazy val ord: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(child.dataType)
      .asInstanceOf[Ordering[Any]]
    if (ascending) base else base.reverse
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def prettyName: String = "top_k_rows"

  override def nullable: Boolean = false

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  private def shrink(b: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] =
    if (b.length <= k) b
    else {
      val kept = b.sorted(ord).take(k)
      b.clear()
      b ++= kept
    }

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v != null) {
      buffer += InternalRow.copyValue(v)
      if (buffer.length >= 4 * k) shrink(buffer)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any])
      : mutable.ArrayBuffer[Any] = shrink(buffer ++= other)

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.sorted(ord).take(k).toArray)

  // the Collect-aggregate serialization pattern: one UnsafeRow holding
  // the buffer as an array value. The projection is cached per
  // (deserialized-per-task) instance — serialize runs once per GROUP at
  // partial-output time, and re-running UnsafeProjection.create's
  // codegen pipeline per group dominated the aggregate's cost before
  // this was hoisted (measured ~3x on the o11 gate).
  @transient private lazy val bufferProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buffer: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val array = new GenericArrayData(shrink(buffer).toArray)
    bufferProjection(InternalRow(array)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val array = row.getArray(0)
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < array.numElements()) {
      buf += InternalRow.copyValue(array.get(i, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): TopKRowsAgg = copy(child = newChild)
}

object TopKRows {
  import org.apache.spark.sql.graft.ColumnShim

  /** Aggregate column: the k smallest (`ascending=true`) or largest
    * struct values per group, sorted, as `array<struct>`. */
  def topKStructs(e: Column, k: Int, ascending: Boolean = true): Column =
    ColumnShim.column(
      TopKRowsAgg(ColumnShim.expression(e), k, ascending)
        .toAggregateExpression())
}
