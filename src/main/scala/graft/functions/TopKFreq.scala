package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One ranked item of a [[TopKFreq]] result. */
case class TopKItem(item: String, cnt: Long)

/** SpaceSaving top-k frequent-items sketch (Metwally et al., ICDT'05)
  * as a typed `Aggregator` — the custom-UDAF surface of the engine
  * (scalar ops are native Expressions; this is the aggregate form).
  *
  * Capacity-bounded state: at most `capacity` counters per group at
  * any time, merged associatively across partitions (partial
  * aggregation applies — each executor keeps ≤ capacity counters per
  * group, the shuffle carries sketches, not rows). When `capacity` ≥
  * the group's distinct-item count the result is EXACT — which is how
  * the driver oracle checks it (events has 5 event types, capacity 32).
  *
  * Determinism: eviction and the final ranking break count ties by
  * item string order, so results are stable across partitionings.
  *
  * Error contract in the approximate regime (capacity < distinct):
  * counters always sum to the exact stream length N (eviction
  * inherits the min counter, so mass is conserved); every counter
  * only OVERestimates, by at most 2N/capacity under Spark's two-level
  * partial/final aggregation — N/c from the final fold's min counter
  * plus ≤ N/c of error accumulated inside re-streamed leaf summaries
  * (the merge replays the right summary as weighted arrivals; the
  * final merge is a flat fold over leaf partials, so the factor stays
  * 2 regardless of partition count). Items with true count > 2N/c
  * are guaranteed present. The `topk_freq_bound` driver gate checks
  * all three exactly against DuckDB-recomputed truth.
  */
class TopKFreq(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[TopKItem]] {
  require(k > 0 && capacity >= k)

  override def zero: Map[String, Long] = Map.empty

  private def bump(b: Map[String, Long], item: String, by: Long): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + by)
      case None if b.size < capacity => b.updated(item, by)
      case None =>
        // SpaceSaving eviction: replace the min-count item (ties by
        // item order), inheriting its count as the overestimate bound
        val (evict, minC) = b.minBy { case (it, c) => (c, it) }
        (b - evict).updated(item, minC + by)
    }

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) b else bump(b, item, 1L)

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    y.foldLeft(x) { case (b, (item, c)) => bump(b, item, c) }

  override def finish(b: Map[String, Long]): Seq[TopKItem] =
    b.toSeq.map { case (i, c) => TopKItem(i, c) }
      .sortBy(t => (-t.cnt, t.item)).take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[TopKItem]] =
    ExpressionEncoder[Seq[TopKItem]]()
}

object TopKFreq {
  /** Column function: `topk_freq(col)` usable in `agg(...)`. */
  def topk_freq(c: org.apache.spark.sql.Column, k: Int,
                capacity: Int = 64): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new TopKFreq(k, capacity),
      Encoders.STRING).apply(c)
}
