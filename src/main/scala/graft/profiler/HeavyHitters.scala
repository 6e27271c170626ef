package graft.profiler

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a mergeable Spark Aggregator —
  * the bounded-state companion to the exact `profile_topk_values`
  * analyzer (which shuffles every distinct value; this shuffles at
  * most k-1 counters per group regardless of domain size).
  *
  * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al. 2012,
  * "Mergeable Summaries"): with capacity k, every stored estimate
  * satisfies true_count - n/k <= estimate <= true_count (n = group
  * total), and ANY item with true_count > n/k is present in the
  * sketch. Partial aggregation on each partition and the cross-
  * partition merge both preserve the bound — exactly the shape Spark's
  * two-phase aggregation needs, so a 100 TB groupBy ships k counters
  * per partition instead of the full value domain.
  *
  * When the group's distinct-value count never exceeds k-1 the sketch
  * performs no decrements and the estimates are EXACT — which is what
  * lets the driver oracle-gate the sketch on a small-domain column
  * while the approximate regime is spec-verified against its bound.
  */
object HeavyHitters {

  /** counters: item -> lower-bound estimate. */
  case class MGState(counters: Map[String, Long])

  class MisraGries(k: Int) extends Aggregator[String, MGState, Map[String, Long]] {
    require(k >= 2, s"capacity k must be >= 2, got $k")

    def zero: MGState = MGState(Map.empty)

    def reduce(s: MGState, item: String): MGState =
      // null values are skipped, matching count()/groupBy profiler
      // semantics — a null Map key would also crash Catalyst's MapType
      if (item == null) s
      else s.counters.get(item) match {
        case Some(c) => MGState(s.counters.updated(item, c + 1))
        case None if s.counters.size < k - 1 =>
          MGState(s.counters.updated(item, 1L))
        case None =>
          // classic MG step: decrement every counter, drop zeros, do
          // NOT insert the arriving item
          MGState(
            s.counters.iterator
              .map { case (i, c) => i -> (c - 1) }
              .filter(_._2 > 0)
              .toMap
          )
      }

    def merge(a: MGState, b: MGState): MGState = {
      val combined = (a.counters.keySet ++ b.counters.keySet).iterator
        .map { i =>
          i -> (a.counters.getOrElse(i, 0L) + b.counters.getOrElse(i, 0L))
        }
        .toMap
      if (combined.size <= k - 1) MGState(combined)
      else {
        // subtract the k-th largest count from everything, keep > 0 —
        // at most k-1 survive and the per-item error grows by exactly
        // that subtrahend (the mergeable-summaries rule)
        val kth = combined.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k - 1)
        MGState(
          combined.iterator
            .map { case (i, c) => i -> (c - kth) }
            .filter(_._2 > 0)
            .toMap
        )
      }
    }

    def finish(s: MGState): Map[String, Long] = s.counters

    def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column aggregate: `df.groupBy(...).agg(sketch(k)(col))` yields a
    * map<item, estimate>.
    */
  def sketch(k: Int) = udaf(new MisraGries(k), Encoders.STRING)
}
