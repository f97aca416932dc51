package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Warehouse-load sinks — the reference's BigQuery
  * `load_table_from_dataframe` (K1, etl_tools.py:67-77; table name
  * `{table}_{endpoint}` built at outreach_etl.py:217, default load
  * semantics = append) re-expressed as Spark writers.
  *
  * Scale design:
  *  - append/overwrite are committed via Spark's file commit protocol
  *    (atomic rename per task attempt) — task retries can't duplicate
  *    rows the way the reference's retry loop does
  *    (bug at outreach_etl.py:152-155, SURVEY.md §2.12);
  *  - date-partitioned layout (`ds=YYYY-MM-DD` directories) is what
  *    turns the incremental window filter into partition pruning at
  *    100 TB;
  *  - re-running a window is idempotent with dynamic partition
  *    overwrite: only the re-pulled days are replaced, concurrent
  *    other-day writers are untouched — the exactly-once upsert the
  *    reference defers to BigQuery.
  */
object Sink {

  /** Reference table naming: `{table}_{endpoint}`
    * (outreach_etl.py:217).
    */
  def tableName(base: String, endpoint: String): String = s"${base}_$endpoint"

  /** Plain append load — the reference's default BigQuery semantics. */
  def appendLoad(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Full overwrite load (the reference's full-history replication
    * target state).
    */
  def overwriteLoad(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Date-partitioned incremental load: derive `ds` from `tsCol` and
    * overwrite ONLY the partitions present in this batch (dynamic
    * partition overwrite), so re-pulling a replication window is
    * idempotent instead of duplicating (the at-least-once → exactly-
    * once upgrade over the reference).
    */
  def partitionedWindowLoad(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("ds", date_format(col(tsCol), "yyyy-MM-dd"))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .partitionBy("ds")
      .parquet(path)

  /** Compact a parquet directory to ~`targetBytes` output files — the
    * small-files remedy every incremental sink needs at scale (each
    * AvailableNow tick / window re-pull appends task-count files; a
    * year of 15-minute ticks is ~35k files per partition, and file
    * listing + per-file open costs dominate reads long before data
    * size does). Sizes the repartition from the directory's actual
    * on-disk bytes, writes to a sibling temp dir, then swaps —
    * readers either see the old layout or the new one.
    *
    * Returns the number of files written.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L << 20): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    spark.read.parquet(path)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(hPath, true)
    require(fs.rename(tmp, hPath), s"compaction swap failed for $path")
    n
  }

  /** Bucketed catalog table: rows hash-clustered (and sorted) by
    * `key` into `buckets` files per partition. Two tables bucketed the
    * same way join with ZERO Exchange — the shuffle is paid ONCE at
    * write time and amortized over every subsequent join/aggregation
    * on the key, the standard layout for a 100 TB fact table that is
    * joined daily (SinkSpec asserts the Exchange-free SortMergeJoin
    * plan). Bucketing requires the catalog (`saveAsTable`) — plain
    * `parquet(path)` writes lose the bucket metadata.
    */
  def bucketedSave(df: DataFrame, table: String, key: String,
                   buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
