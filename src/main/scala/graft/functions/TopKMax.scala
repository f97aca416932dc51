package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (value, id) candidate of a [[TopKMax]] result. */
case class TopVal(v: Long, id: Long)

/** EXACT bounded top-k per group as a typed `Aggregator` — the
  * aggregation answer to "top-k per key" that a ranking window can't
  * give at scale: `row_number() OVER (PARTITION BY key ...)` shuffles
  * EVERY row to its key's reducer and sorts there, while this
  * aggregator's partial state is ≤ k rows per group per partition, so
  * the map side combines first and the shuffle carries at most
  * k · groups · partitions tiny structs. Top-k by (v desc, id asc) is
  * associative and commutative (merge = union → sort → take k), so
  * the result is EXACT and partitioning-independent — unlike
  * [[TopKFreq]] there is no sketch error to bound, and the driver
  * oracle checks it against the window-function definition.
  */
class TopKMax(k: Int)
    extends Aggregator[TopVal, Seq[TopVal], Seq[TopVal]] {
  require(k > 0)

  // (v desc, id asc) via explicit Orderings — negating the value
  // (`-t.v`) overflows at Long.MinValue, which would rank as LARGEST
  private val topOrd: Ordering[TopVal] =
    Ordering.by[TopVal, (Long, Long)](t => (t.v, t.id))(
      Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))

  private def prune(b: Seq[TopVal]): Seq[TopVal] =
    b.sorted(topOrd).take(k)

  override def zero: Seq[TopVal] = Seq.empty
  override def reduce(b: Seq[TopVal], x: TopVal): Seq[TopVal] =
    prune(b :+ x)
  override def merge(x: Seq[TopVal], y: Seq[TopVal]): Seq[TopVal] =
    prune(x ++ y)
  override def finish(b: Seq[TopVal]): Seq[TopVal] = prune(b)

  override def bufferEncoder: Encoder[Seq[TopVal]] =
    ExpressionEncoder[Seq[TopVal]]()
  override def outputEncoder: Encoder[Seq[TopVal]] =
    ExpressionEncoder[Seq[TopVal]]()
}

object TopKMax {
  /** Column function: `topk_max(v, id, k)` usable in `agg` (the
    * product input encoder flattens TopVal into two argument columns).
    */
  def topk_max(v: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new TopKMax(k),
      Encoders.product[TopVal]).apply(v, id)
}
