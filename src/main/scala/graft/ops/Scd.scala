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
  * [[type2Salted]] is the in-house mitigation (order-aligned bucket
  * salting + offset stitch, hash-identical output).
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

  /** SKEW-HARDENED [[type2]]: a hot business key (one entity with
    * millions of versions) pools the plain window's entire key in a
    * single task. This variant salts the window with an
    * ORDER-ALIGNED bucket — `bucket` MUST be a pure monotone function
    * of `orderCol` (e.g. the change's epoch-week), so (a) every row
    * of bucket i precedes every row of bucket j > i within a key and
    * (b) order ties land in the same bucket — and stitches the
    * per-bucket results with a per-(key, bucket) offset join (the
    * `dedup_salted` two-phase precedent):
    *
    *  1. local pass: row_number + lead inside (key, bucket) — the hot
    *     key now spreads over |buckets| tasks;
    *  2. a tiny (key, bucket) stats table (count, first change) gets
    *     cumulative offsets and the NEXT bucket's first timestamp via
    *     a window over |keys × buckets| rows — a design constant,
    *     never corpus-proportional;
    *  3. broadcast-join back: global version = local rank + offset;
    *     a bucket's last interval closes at the next non-empty
    *     bucket's first change.
    *
    * Output contract identical to [[type2]] — the driver query
    * `scd2_salted` hash-checks it against the plain global-window
    * oracle, which is the whole point: salting must be
    * indistinguishable from the single-task window.
    *
    * Scan economics: the local pass and the stats aggregate each read
    * the (pruned) change-log columns once — two narrow scans. That is
    * the floor without pinning corpus rows (the r9 multi-scan
    * convention pins reused AGGREGATES; checkpointing the full change
    * log to save one pruned scan would be the worse trade at 100 TB).
    */
  def type2Salted(changes: DataFrame, keyCols: Seq[String],
                  orderCol: String, tieCol: String,
                  attrCols: Seq[String],
                  bucket: org.apache.spark.sql.Column): DataFrame = {
    val base = changes
      .select((keyCols ++ Seq(orderCol, tieCol) ++ attrCols).distinct.map(col): _*)
      .withColumn("__bucket", bucket)
    val wl = Window.partitionBy((keyCols :+ "__bucket").map(col): _*)
      .orderBy(col(orderCol), col(tieCol))
    val local = base
      .withColumn("__lrn", row_number().over(wl).cast("long"))
      .withColumn("__lnext", lead(col(orderCol), 1).over(wl))
    val wb = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__bucket"))
    val stats = base.groupBy((keyCols :+ "__bucket").map(col): _*)
      .agg(count(lit(1)).as("__cnt"), min(col(orderCol)).as("__first"))
      .withColumn("__offset", coalesce(sum(col("__cnt"))
        .over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__nextb", lead(col("__first"), 1).over(wb))
      .drop("__cnt", "__first")
    local.join(broadcast(stats), keyCols :+ "__bucket")
      .withColumn("version", (col("__lrn") + col("__offset")).cast("int"))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", coalesce(col("__lnext"), col("__nextb")))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1).otherwise(0).cast("int"))
      .drop("__bucket", "__lrn", "__lnext", "__offset", "__nextb")
  }
}
