package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (neighbor, score) candidate flowing into the top-k accumulator. */
case class ScoredHit(id: Long, cosine: Double)

/** Bounded top-k accumulator for similarity re-rank.
  *
  * Replaces `row_number().over(Window.partitionBy(query))` for per-query
  * top-k: the window funnels EVERY scored row of a query into the single
  * task that owns that partition key (|corpus| rows per query through one
  * task at 100 TB). As a typed Aggregator it runs as ObjectHashAggregate
  * with map-side partial aggregation — each input task reduces its slice to
  * ≤ k rows locally, and only bands of k-row buffers shuffle.
  *
  * Buffer policy: append-only until 4k entries, then sort+truncate to k —
  * amortized O(log k) per row, exact result. Ordering is (cosine DESC,
  * id ASC), matching the SQL window the oracle uses, so ties break
  * identically.
  */
class TopKAgg(k: Int)
    extends Aggregator[ScoredHit, mutable.ArrayBuffer[ScoredHit],
      Array[ScoredHit]] {

  private val ord: Ordering[ScoredHit] =
    Ordering.by((h: ScoredHit) => (-h.cosine, h.id))

  private def shrink(b: mutable.ArrayBuffer[ScoredHit])
      : mutable.ArrayBuffer[ScoredHit] =
    if (b.length <= k) b
    else {
      val kept = b.sorted(ord).take(k)
      b.clear()
      b ++= kept
    }

  override def zero: mutable.ArrayBuffer[ScoredHit] =
    mutable.ArrayBuffer.empty[ScoredHit]

  override def reduce(b: mutable.ArrayBuffer[ScoredHit], a: ScoredHit)
      : mutable.ArrayBuffer[ScoredHit] = {
    b += a
    if (b.length >= 4 * k) shrink(b) else b
  }

  override def merge(x: mutable.ArrayBuffer[ScoredHit],
                     y: mutable.ArrayBuffer[ScoredHit])
      : mutable.ArrayBuffer[ScoredHit] = shrink(x ++= y)

  override def finish(b: mutable.ArrayBuffer[ScoredHit]): Array[ScoredHit] =
    b.sorted(ord).take(k).toArray

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[ScoredHit]] =
    Encoders.kryo[mutable.ArrayBuffer[ScoredHit]]

  override def outputEncoder: Encoder[Array[ScoredHit]] =
    ExpressionEncoder[Array[ScoredHit]]()
}
