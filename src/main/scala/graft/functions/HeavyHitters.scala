package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One surviving counter of a Misra–Gries summary. `est` UNDER-estimates
  * the true count by at most n/(k+1) (n = items seen). */
case class HeavyHit(item: String, est: Long)

/** Misra–Gries heavy-hitters summary (Misra & Gries, "Finding repeated
  * elements", Sci. Comput. Program. 2, 1982) as a typed Aggregator —
  * the bounded-memory answer to "which values dominate this column"
  * when the domain is unbounded (tokens, URLs, user agents) and an
  * exact groupBy-count would carry the whole domain through the
  * shuffle.
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
  * Guarantees (machine-checked in the gate, partitioning-INDEPENDENT
  * even though the estimates themselves can vary with merge order):
  *  - `est ≤ true count` (never over-counts);
  *  - `true count − est ≤ n/(k+1)`;
  *  - every item with true count > n/(k+1) is PRESENT in the summary.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Array[HeavyHit]] {

  require(k >= 1, s"heavy-hitters summary needs k >= 1, got $k")

  override def zero: mutable.Map[String, Long] =
    mutable.Map.empty[String, Long]

  /** Subtract the smallest surviving count needed to bring the map back
    * to ≤ k entries: the (k+1)-th largest value, MG's batched
    * decrement. */
  private def compact(b: mutable.Map[String, Long])
      : mutable.Map[String, Long] = {
    if (b.size <= k) b
    else {
      val cut = b.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val kept = b.iterator
        .collect { case (i, c) if c > cut => i -> (c - cut) }
        .to(mutable.Map)
      kept
    }
  }

  override def reduce(b: mutable.Map[String, Long], item: String)
      : mutable.Map[String, Long] =
    if (item == null) b
    else {
      b.updateWith(item) {
        case Some(c) => Some(c + 1)
        case None => Some(1L)
      }
      if (b.size > k) compact(b) else b
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

  /** Counters sorted (est desc, item asc) — a deterministic display
    * order for whatever counter SET the merge order produced. */
  override def finish(b: mutable.Map[String, Long]): Array[HeavyHit] =
    b.toArray.map { case (i, c) => HeavyHit(i, c) }
      .sortBy(h => (-h.est, h.item))

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Array[HeavyHit]] =
    ExpressionEncoder[Array[HeavyHit]]()
}
