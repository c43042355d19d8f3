package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary: a bounded `capacity`-entry
  * (item → count) map with the guarantee that every item whose true
  * frequency exceeds N/(capacity+1) is present, and each kept count
  * under-estimates the truth by at most N/(capacity+1).
  *
  * This is the frequent-items member of the mergeable-sketch family the
  * engine already carries (HLL distinct q192, KLL-style percentile
  * q193): partial summaries built per partition merge associatively by
  * summing counts and re-decrementing down to capacity (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012), so it runs as an ordinary
  * partial+final Spark aggregation — one pass, no shuffle of raw items,
  * driver result bounded by `capacity` regardless of corpus size. The
  * intended 100 TB use is the two-pass exact top-k: sketch pass emits a
  * candidate superset, a recount pass (semi-join on the ≤capacity
  * candidates, broadcast) makes the counts exact.
  *
  * Reference analogue: vocabulary / frequent-token profiling over the
  * documents corpus (SURVEY §2.12).
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, "capacity must be positive")

  def zero: Map[String, Long] = Map.empty

  /** Decrement-all until at most `capacity` entries survive. One shared
    * decrement of the (capacity+1)-th largest count preserves the MG
    * invariant in a single step instead of unit-decrement loops.
    *
    * [[reduce]]'s steady state arrives here at exactly capacity+1
    * entries, where the (capacity+1)-th largest IS the minimum — O(k)
    * per row, no sort. Only [[merge]] (once per partition pair, up to
    * 2·capacity entries) pays the sorted selection. The per-row map
    * copy is inherent to the immutable buffer the Spark encoder needs
    * and is fine at profiling capacities (≤ a few hundred). */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      val cut =
        if (m.size == capacity + 1) m.values.min
        else m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      m.flatMap { case (k, v) =>
        if (v - cut > 0) Some(k -> (v - cut)) else None
      }
    }

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    shrink(b.updated(x, b.getOrElse(x, 0L) + 1L))

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    shrink(b.foldLeft(a) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    })

  def finish(b: Map[String, Long]): Map[String, Long] = b

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
