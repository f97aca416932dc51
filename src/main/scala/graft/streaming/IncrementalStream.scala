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

  /** Streaming canonical dedup with KEEP-MIN-ID semantics — the
    * streaming form of [[graft.ops.Dedup.exactDedup]]. `dropDuplicates`
    * keeps whichever duplicate ARRIVES first (micro-batch order, not
    * deterministic across runs); canonical dedup must keep the same
    * representative the batch operator picks (the minimum id), so this
    * holds per-digest state via `flatMapGroupsWithState` and re-emits
    * `(key_digest, keep_id, n_copies)` whenever a group changes
    * (Update output mode; downstream upserts by digest).
    *
    * Scale: state is one (long, long) per DISTINCT digest — the same
    * cardinality the batch groupBy shuffles — partitioned by digest
    * across executors and checkpointed. Pass `stateTtl` (with an
    * upstream watermark on event time) to evict idle digests via
    * event-time timeout, bounding state for unbounded streams; dedup
    * is then exact within the TTL horizon, the same contract as
    * [[dedupWithinWatermark]].
    */
  def canonicalDedupStream(stream: DataFrame, idCol: String,
                           digestCol: String,
                           stateTtlMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val timeoutConf = if (stateTtlMs.isDefined)
      GroupStateTimeout.EventTimeTimeout() else GroupStateTimeout.NoTimeout()
    stream
      .select(col(digestCol).cast("string").as("digest"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (String, Long, Long)](
        OutputMode.Update(), timeoutConf) { (digest, rows, state) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val ids = rows.map(_._2).toArray
          val (prevMin, prevN) = state.getOption.getOrElse((Long.MaxValue, 0L))
          val next = (math.min(prevMin, ids.min), prevN + ids.length)
          state.update(next)
          stateTtlMs.foreach(ttl =>
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl))
          Iterator((digest, next._1, next._2))
        }
      }
      .toDF("key_digest", "keep_id", "n_copies")
  }

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
