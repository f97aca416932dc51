package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumnShim.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: reduce a huge fact table to the rows
  * whose key MIGHT match a dimension subset, without shuffling the
  * fact side at all — the manual form of the runtime filter AQE
  * injects under `spark.sql.optimizer.runtime.bloomFilter.enabled`,
  * exposed as an operator so a pipeline can build the filter once and
  * reuse it across several consumers.
  *
  * Built from Spark's own machinery end to end: the build side is ONE
  * whole-stage-codegen `BloomFilterAggregate` over `xxhash64(key)`
  * (partial sketches merged executor-side, only the final ~1 MB bitmap
  * reaches the driver), and the probe side is the codegen'd
  * `BloomFilterMightContain` predicate over the same hash — a narrow
  * scan-stage filter, pushable below any later shuffle.
  *
  * Guarantees: NO false negatives (every true match survives), false
  * positives at the sketch's ~3% default — so the result is a strict
  * superset of the exact semi-join, suitable as a pre-filter before
  * the real join, not as the join itself.
  *
  * Scale bound: the serialized filter is broadcast as a literal, so
  * `expectedItems` is capped where the bitmap reaches ~16 MB. For
  * dimension key sets beyond that (≳10⁷ distinct keys), flip on AQE's
  * injected runtime filter or pre-partition instead — a gigabyte
  * literal in the plan would dwarf what it saves.
  */
object BloomPrune {

  /** ~7.3 bits/item at the 3% default fpp → 16M items ≈ 15 MB. */
  val MaxExpectedItems: Long = 16L << 20

  /** Serialize a Bloom filter of `dim`'s `dimKey` values (one
    * distributed aggregate; only the bitmap is collected).
    */
  def buildFilter(dim: DataFrame, dimKey: Column, expectedItems: Long): Array[Byte] = {
    require(expectedItems > 0 && expectedItems <= MaxExpectedItems,
      s"expectedItems must be in (0, $MaxExpectedItems]; beyond that the " +
        "literal bitmap outweighs the pruning — use AQE's runtime filter")
    val agg = new BloomFilterAggregate(
      expression(xxhash64(dimKey)), expectedItems)
    // NULL keys are excluded on BOTH sides (here and in prune) so the
    // pruned superset matches null-rejecting equi-join semantics:
    // xxhash64 maps NULL to the seed constant, so without the filters
    // a single NULL dim key would admit every NULL fact key (plus any
    // value colliding with the seed hash) through the bitmap.
    dim.where(dimKey.isNotNull)
      .select(column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Filter `fact` down to rows whose `factKey` might be in the
    * serialized filter (superset of the exact equi-join match set;
    * NULL fact keys are dropped, as an equi-join would).
    */
  def prune(fact: DataFrame, factKey: Column, filter: Array[Byte]): DataFrame =
    fact.filter(factKey.isNotNull && column(BloomFilterMightContain(
      Literal(filter, BinaryType), expression(xxhash64(factKey)))))

  /** Build + probe in one call. */
  def bloomSemiFilter(fact: DataFrame, factKey: Column,
                      dim: DataFrame, dimKey: Column,
                      expectedItems: Long): DataFrame =
    prune(fact, factKey, buildFilter(dim, dimKey, expectedItems))
}
