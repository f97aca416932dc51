package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass second-moment statistics of a vector column — the
  * custom-aggregate companion to the PCA family's compositional path
  * (`Pca.covCells`'s double `posexplode`): the buffer is ONE flat
  * int64 array `[n, S_0..S_{d-1}, P_00, P_01.., P_11, ..]` (count,
  * per-dimension sums, upper-triangle uncentered products), so the
  * whole covariance scan runs inside a single ObjectHashAggregate
  * with NO row generation — where the exploded form materializes
  * N·d(d+1)/2 rows through a 2,080-group hash map, this does
  * d(d+1)/2 array adds per input row and ships ONE 17 KB buffer per
  * partition.
  *
  * Exactness: identical integer sums (addition commutes), and every
  * accumulation uses `Math.addExact`/`multiplyExact` so int64
  * overflow THROWS instead of wrapping silently — the Aggregator
  * analogue of the ANSI-mode loudness the SQL path gets for free.
  * PcaSpec pins cell-for-cell equality against the exploded path.
  *
  * The centered covariance and variances derive EXACTLY from these
  * raw moments (Σ(xᵢ−mᵢ)(xⱼ−mⱼ) = Pᵢⱼ − mᵢSⱼ − mⱼSᵢ + n·mᵢmⱼ for any
  * integer constants m), so one scan now feeds the power iteration,
  * the z-score moments, the correlation matrix, and the incremental
  * raw-stats merge.
  */
class VectorStatsAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  private def alloc(d: Int): Array[Long] =
    new Array[Long](1 + d + d * (d + 1) / 2)

  override def reduce(b0: Array[Long], xe: Seq[Long]): Array[Long] = {
    if (xe == null) return b0
    val x = xe.toArray
    val d = x.length
    val b = if (b0.isEmpty) alloc(d) else b0
    require(b.length == 1 + d + d * (d + 1) / 2,
      s"vector length changed mid-stream: buffer d != input d = $d")
    b(0) = Math.addExact(b(0), 1L)
    var i = 0
    var p = 1 + d
    while (i < d) {
      b(1 + i) = Math.addExact(b(1 + i), x(i))
      var j = i
      while (j < d) {
        b(p) = Math.addExact(b(p), Math.multiplyExact(x(i), x(j)))
        p += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    require(x.length == y.length, "merging stats of different dims")
    var i = 0
    while (i < x.length) { x(i) = Math.addExact(x(i), y(i)); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object VectorStatsAgg {
  /** Column function: `vector_stats(arrayCol)` usable in `agg(...)`. */
  def vector_stats(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new VectorStatsAgg,
      ExpressionEncoder[Seq[Long]]()).apply(c)
}
