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

/** One (value, weight) candidate flowing into the weighted top-k
  * accumulator. */
case class WeightedValue(value: String, weight: Long)

/** Bounded weighted top-k accumulator — the heavy-hitters finisher over
  * pre-aggregated (value, weight) rows. Same buffer policy and scale
  * rationale as [[TopKAgg]] (map-side partials of ≤ k rows instead of a
  * per-key window funnel); ordering (weight DESC, value ASC) matches the
  * SQL window the oracle uses, so ties break identically. Weights must
  * already be per-(key, value) totals: the accumulator selects, it does
  * not sum — summing belongs to the upstream count aggregation, where
  * map-side combine does it without object state. */
class TopKWeightedAgg(k: Int)
    extends Aggregator[WeightedValue, mutable.ArrayBuffer[WeightedValue],
      Array[WeightedValue]] {

  private val ord: Ordering[WeightedValue] =
    Ordering.by((h: WeightedValue) => (-h.weight, h.value))

  private def shrink(b: mutable.ArrayBuffer[WeightedValue])
      : mutable.ArrayBuffer[WeightedValue] =
    if (b.length <= k) b
    else {
      val kept = b.sorted(ord).take(k)
      b.clear()
      b ++= kept
    }

  override def zero: mutable.ArrayBuffer[WeightedValue] =
    mutable.ArrayBuffer.empty[WeightedValue]

  override def reduce(b: mutable.ArrayBuffer[WeightedValue],
                      a: WeightedValue)
      : mutable.ArrayBuffer[WeightedValue] = {
    b += a
    if (b.length >= 4 * k) shrink(b) else b
  }

  override def merge(x: mutable.ArrayBuffer[WeightedValue],
                     y: mutable.ArrayBuffer[WeightedValue])
      : mutable.ArrayBuffer[WeightedValue] = shrink(x ++= y)

  override def finish(b: mutable.ArrayBuffer[WeightedValue])
      : Array[WeightedValue] = b.sorted(ord).take(k).toArray

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[WeightedValue]] =
    Encoders.kryo[mutable.ArrayBuffer[WeightedValue]]

  override def outputEncoder: Encoder[Array[WeightedValue]] =
    ExpressionEncoder[Array[WeightedValue]]()
}
