package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build: turn a change log
  * into versioned validity intervals per business key — the warehouse
  * shape a CRM sync (reference domain: prospects/accounts landing in
  * BigQuery, outreach_etl.py:74-111) needs when the target table must
  * keep history instead of overwriting.
  *
  * Plan shape: ONE shuffle on the business key serves the whole
  * operator — `row_number`, `lead`, and the current-flag all ride the
  * same window sort, so Catalyst plans a single Exchange + Sort
  * followed by one Window node. At 100 TB the cost is that single
  * hash-partition-by-key pass; no join, no second shuffle. Skewed keys
  * (one entity with millions of versions) would pool in one task —
  * mitigate upstream by bounding versions per key per batch, not here.
  */
object Scd {

  /** Expand `changes` into SCD-2 rows. `orderCol` is the change
    * timestamp; `tieCol` must make (key, orderCol, tieCol) unique so
    * version numbering is deterministic under timestamp ties.
    *
    * Output columns: the key columns, `attrCols`, plus
    * `version` (1-based INT), `valid_from` (= orderCol),
    * `valid_to` (next version's orderCol, NULL while current),
    * `is_current` (1/0 INT).
    */
  def type2(changes: DataFrame, keyCols: Seq[String], orderCol: String,
            tieCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol), col(tieCol))
    changes
      .select((keyCols ++ Seq(orderCol, tieCol) ++ attrCols).distinct.map(col): _*)
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1).otherwise(0).cast("int"))
  }
}
