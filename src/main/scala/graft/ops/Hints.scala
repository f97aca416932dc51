package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-strategy helpers that keep small-side hints from becoming
  * scale bugs. A bare `broadcast(df)` hint is unconditional: correct
  * while `df` is small, an executor OOM once `df` grows with the
  * corpus (the round-1/2 ANN queries broadcast the query set — 5% of
  * all vectors — which is exactly such a time bomb at 100×).
  */
object Hints {

  /** Default size bound for a gated broadcast hint (bytes). Matches
    * the order of magnitude of `spark.sql.autoBroadcastJoinThreshold`
    * ceilings used in production (tens of MB per executor copy).
    */
  val DefaultBroadcastBytes: Long = 64L << 20

  /** Catalyst's size estimate for the frame — no job is run. Without
    * CBO column stats the estimate degrades conservatively to the
    * child scan's size, i.e. a filter over a big table counts as big,
    * which errs toward NOT broadcasting at scale.
    */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** `broadcast(df)` only when Catalyst's size estimate fits
    * `maxBytes`; otherwise the frame is returned unhinted and the
    * planner falls back to a shuffle join (equi-join) or cartesian
    * (theta-join — see [[chunkedBroadcastThetaJoin]] for that case).
    */
  def maybeBroadcast(df: DataFrame,
                     maxBytes: Long = DefaultBroadcastBytes): DataFrame =
    if (estimatedBytes(df) <= maxBytes) broadcast(df) else df

  /** Theta-join (e.g. the brute-force ANN cross product) with the
    * SMALL side broadcast in bounded chunks. When `small` fits
    * `maxBytes` this is exactly `large.join(broadcast(small), cond)` —
    * one BroadcastNestedLoopJoin. When it doesn't, `small` is split
    * into ceil(estimate / maxBytes) deterministic hash chunks of
    * `chunkKey`, each chunk broadcast-joined to `large`, results
    * unioned: the cross product is unchanged (chunks partition the
    * rows), but every in-flight broadcast stays under the bound
    * instead of growing with the corpus. The scan of `large` is
    * repeated per chunk — the price of exactness; the sublinear
    * alternative is the LSH/IVF path.
    */
  def chunkedBroadcastThetaJoin(large: DataFrame, small: DataFrame,
                                chunkKey: Column, cond: Column,
                                maxBytes: Long = DefaultBroadcastBytes): DataFrame = {
    val est = estimatedBytes(small)
    if (est <= maxBytes) large.join(broadcast(small), cond)
    else {
      val nChunks = ((est + maxBytes - 1) / maxBytes).min(BigInt(4096)).toInt
      (0 until nChunks)
        .map(i => large.join(
          broadcast(small.filter(pmod(hash(chunkKey), lit(nChunks)) === i)), cond))
        .reduce(_.union(_))
    }
  }
}
