package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-day-partition sync MANIFEST maintenance — the reconciliation
  * artifact an incremental warehouse sync keeps per day: row count,
  * id bounds, and an order-invariant content digest (the sum of
  * per-row SplitMix64 `shuffle_key` values; integer addition
  * commutes, so the digest is partition-layout- and
  * arrival-order-independent). Comparing manifests pinpoints WHICH
  * day diverged where a single global checksum only says THAT
  * something did (the per-partition refinement of
  * [[graft.ops.Sink.tableChecksum]]).
  *
  * Two maintenance modes share one cell shape:
  *  - batch recompute: one scan + one day-grouped aggregate
  *    (`AdvancedQueries.partitionManifest`);
  *  - streamed maintenance: each micro-batch reduces to its per-day
  *    cells and the cells are PERSISTED to a parquet store keyed by
  *    batch id ([[writeBatchCells]]) — idempotent on replay (a
  *    restarted incarnation that re-runs a batch overwrites the same
  *    `batch=<id>` directory) and durable across incarnations (the
  *    running manifest is [[current]] = a merge over the tiny cell
  *    store, never a re-scan of history). Counts and digest sums are
  *    additive; min/max merge by min/max.
  *
  * Digest representation (house rule, round 9): emitted numeric cells
  * stay within int64. The exact per-day sum of signed 64-bit hashes
  * can reach ~±2×10²⁰ at sf0.01 — so the exact sum rides as
  * decimal(38,0) only INSIDE the plan and the emitted digest is the
  * sum wrapped mod 2⁶⁴ and reinterpreted signed ([[wrapSigned64]]),
  * exactly what an overflowing two's-complement accumulator would
  * produce. Wrap-around addition still commutes (mod-2⁶⁴ arithmetic
  * is a ring), so order/partition/batch-split invariance holds, and
  * the oracle replays it with HUGEINT mod + signed reinterpret.
  *
  * Scale shape: a cell store holds days × batches fixed-width rows —
  * for a year-long ingest at hourly batches that is ~10⁴ rows total,
  * independent of corpus size; [[current]] is a broadcast-sized
  * aggregate. The per-batch cell reduction is one map-side-combined
  * aggregate over only the arriving batch.
  */
object Manifest {

  /** Exact decimal sum → wrap-around signed int64 (sum mod 2⁶⁴,
    * reinterpreted signed). ANSI mode forbids overflowing long sums,
    * so the wrap is spelled in decimal arithmetic: mod into
    * [0, 2⁶⁴), then subtract 2⁶⁴ from the upper half.
    */
  def wrapSigned64(sumDec: Column): Column = {
    val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
    val two63 = lit(new java.math.BigDecimal("9223372036854775808"))
    val m = ((sumDec % two64) + two64) % two64
    when(m >= two63, m - two64).otherwise(m).cast("long")
  }

  /** Reduce one batch (or the whole table) to its per-day manifest
    * cells: (day, n, mn, mx, dg) with dg the EXACT decimal(38,0)
    * digest sum — cells stay exact so cross-batch merges commute with
    * the wrap; only the final emission wraps.
    */
  def dayCells(batch: DataFrame, day: Column, id: Column,
               salt: Long): DataFrame = {
    import graft.functions.dsl.shuffle_key
    batch
      .select(day.as("day"), id.as("id"),
        shuffle_key(id, salt).as("h"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"),
        sum(col("h").cast("decimal(38,0)")).as("dg"))
  }

  /** Persist one batch's cells under `store/batch=<id>/` — replaying
    * the same batch id (checkpoint recovery re-delivers the
    * in-flight batch) OVERWRITES the same directory, so the store
    * never double-counts. A no-row batch writes an empty directory
    * (schema-only), which [[current]] merges as zero cells.
    */
  def writeBatchCells(cells: DataFrame, store: String,
                      batchId: Long): Unit =
    cells.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$store/batch=$batchId")

  /** The running manifest: merge every persisted cell by day. Reads
    * the cell store (days × batches fixed-width rows — tiny by
    * construction), never the ingested history.
    */
  def current(s: SparkSession, store: String): DataFrame =
    s.read.parquet(store)
      .groupBy(col("day"))
      .agg(sum(col("n")).as("n_rows"),
        min(col("mn")).as("min_id"),
        max(col("mx")).as("max_id"),
        wrapSigned64(sum(col("dg"))).as("digest"))
}
