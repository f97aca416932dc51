package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming adapter for the reference's incremental
  * replication contract (SURVEY.md §2.10): a tumbling 1-day window on
  * the update timestamp with cron-managed offsets becomes a streaming
  * source with checkpointed progress, a watermark, and streaming
  * dedup — at-least-once re-pulls (the reference's duplicate-row
  * behavior) collapse to effectively-once via `dropDuplicates` within
  * the watermark.
  *
  * Kept as a thin adapter over the batch ops (SURVEY.md §7.4: the
  * driver harness has no streaming surface — parity lives in unit
  * tests, not the oracle).
  */
object IncrementalStream {

  /** File-based streaming read of an append-only directory (each
    * micro-batch = newly arrived files; the reference's "new pages
    * since last cron run").
    */
  def readAppendStream(spark: SparkSession, dir: String,
                       schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked streaming dedup on the record key — the streaming
    * form of [[graft.ops.Incremental.dedupLatest]]: duplicates from
    * window re-pulls are dropped while their key is within the
    * watermark. State is bounded by the watermark horizon — at scale
    * this is what makes the operator runnable indefinitely.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String,
                           watermark: String, keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** Tumbling-window per-day counts over the stream — the incremental
    * replication ledger (rows per day per type), append-mode emitted
    * once the watermark passes each day.
    */
  def dailyCounts(stream: DataFrame, tsCol: String, typeCol: String,
                  watermark: String = "1 day"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day").as("day_window"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(col("day_window.start").as("day"), col(typeCol), col("n"))

  /** Run a streaming frame to a parquet sink with checkpointing,
    * processing everything currently available (the cron-run
    * equivalent: one `Trigger.AvailableNow` invocation per schedule
    * tick, offsets persisted in the checkpoint instead of the crontab).
    */
  def runAvailableNow(df: DataFrame, outDir: String,
                      checkpointDir: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
