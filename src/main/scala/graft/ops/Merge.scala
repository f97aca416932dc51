package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert — apply a CDC change batch to a snapshot in one
  * pass: the warehouse operation (Delta/Iceberg `MERGE INTO`, BigQuery
  * `MERGE`) that [[Sink.tableDiff]] is the inverse of.
  *
  * Semantics per key:
  *  - matched, source `_deleted` false  → source values win
  *    (NULL source cells inherit the target's value — sparse/partial
  *    updates ride in the same batch);
  *  - matched, source `_deleted` true   → row dropped;
  *  - target only                       → row kept unchanged;
  *  - source only, `_deleted` false     → row inserted;
  *  - source only, `_deleted` true      → no-op (delete of a missing
  *    key is tolerated, matching MERGE WHEN NOT MATCHED semantics).
  *
  * 100 TB shape: ONE full-outer shuffle on the key — no driver
  * state, no collect. A full outer join cannot broadcast, but when
  * the target is bucketed on the key ([[Sink.bucketedSave]]) the
  * target side's exchange disappears and only the (typically tiny)
  * change batch shuffles. Precondition: `key` is unique on both
  * sides (CDC batches are keyed); duplicate source keys would fan
  * out, same contract as tableDiff.
  */
object Merge {

  /** Apply `changes` (same schema as `target` plus a boolean
    * `deleteCol`) to `target` on unique key `key`.
    */
  def upsert(target: DataFrame, changes: DataFrame, key: String,
             deleteCol: String = "_deleted"): DataFrame = {
    val dataCols = target.columns
    require(dataCols.contains(key), s"key $key not in target")
    require(changes.columns.contains(deleteCol),
      s"changes must carry a boolean $deleteCol column")
    require(dataCols.forall(changes.columns.contains),
      "changes must carry every target column (NULL = keep target value)")
    val t = target.as("t")
    val s = changes.as("s")
    t.join(s, col(s"t.$key") === col(s"s.$key"), "full_outer")
      // drops matched deletes AND source-only deletes in one predicate:
      // a row survives iff it is not flagged (absent source = false)
      .filter(!coalesce(col(s"s.$deleteCol"), lit(false)))
      .select(dataCols.map(c =>
        coalesce(col(s"s.$c"), col(s"t.$c")).as(c)).toSeq: _*)
  }
}
