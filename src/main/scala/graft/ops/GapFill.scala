package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a
  * complete per-key daily grid and forward-fill gaps — the step
  * between raw event logs and anything that consumes aligned series
  * (features, charts, day-over-day metrics).
  *
  * Plan shape: ONE shuffle on the key serves the whole operator — the
  * per-day "last observation" window, the grid join, and the
  * forward-fill window all partition by key (the grid side is built
  * from a per-key min/max aggregate and an in-row `sequence` explode,
  * so no second wide table materializes). At 100 TB the failure mode
  * is a key whose date span explodes the grid (sequence() of decades
  * × millions of keys) — `maxDays` bounds the per-key span and fails
  * loudly rather than OOMing an executor on a corrupt timestamp.
  */
object GapFill {

  /** Daily forward-fill: for each key, one row per calendar day from
    * its first to its last event (UTC), carrying the day's LAST
    * observed `valueCol` (ties broken by `tieCol`), forward-filled
    * across observation-free days. Output: key, day_us (µs epoch of
    * the UTC day start), value (filled), is_observed (1/0).
    */
  def dailyForwardFill(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valueCol: String,
                       maxDays: Int = 3653): DataFrame = {
    val perDay = Window.partitionBy(col(keyCol), col("day"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val daily = events
      .withColumn("day", to_date(col(tsCol)))
      .withColumn("__rn", row_number().over(perDay))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("day"), col(valueCol).as("obs"))
    // the guard rides a FILTER (always-true when it doesn't throw):
    // a dead guard column would be pruned before it ever evaluated
    val grid = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .filter(assert_true(datediff(col("d1"), col("d0")) <= maxDays,
        concat(lit(s"gap-fill span exceeds $maxDays days for key "),
          col(keyCol).cast("string"))).isNull)
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("day"))
    val ffill = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol),
        unix_micros(col("day").cast("timestamp")).as("day_us"),
        last(col("obs"), ignoreNulls = true).over(ffill).as("value"),
        when(col("obs").isNotNull, 1).otherwise(0).cast("int")
          .as("is_observed"))
  }
}
