package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key exponential moving average — the sequential-state member
  * of the time-series family (sessionize / gap-fill / anomaly): the
  * smoothing pass a metrics pipeline runs before thresholding, and
  * the canonical example of an operator whose PER-ROW state cannot be
  * expressed as a window aggregate once each step ROUNDS (the
  * truncation inside step t feeds step t+1, so no closed form of
  * prefix sums exists — unlike the un-rounded EMA, which would be a
  * dot product with a^(t-i) weights).
  *
  * Exactness discipline: values quantize to e6 int64 once, then
  * every step is ema ← (aNum·v + (aDen−aNum)·ema) / aDen in int64
  * with TRUNCATING division (Scala `/` = DuckDB `//` — identical on
  * all signs, though the event fixture's domain is non-negative), so
  * the whole trajectory is bit-replayable: the oracle unrolls it as a
  * DuckDB RECURSIVE CTE joining step rn to rn+1.
  *
  * 100 TB shape: ONE hash shuffle on the key, then a sort + linear
  * scan per partition (the secondary-sort pattern): state is one
  * int64 per open key, work is strictly linear, and partitions never
  * exchange state because a key lives in exactly one partition.
  * `mapPartitions` is the honest physical shape here — the same
  * justification as the multimodal codec stage: genuinely sequential
  * per-key recurrence, initialized once per partition, zero driver
  * state.
  */
object Ema {

  /** `df` must carry (user_id, us, event_id, v_e6) — key, epoch-µs
    * order, unique tie-break, e6-quantized value. Returns
    * (user_id, rn, event_id, v_e6, ema_e6) where rn is the 1-based
    * position within the key's (us, event_id) order and
    * ema_1 = v_1, ema_t = (aNum·v_t + (aDen−aNum)·ema_{t−1}) / aDen.
    */
  def smooth(df: DataFrame, aNum: Long, aDen: Long): DataFrame = {
    require(aDen > 0 && aNum > 0 && aNum <= aDen,
      s"alpha = $aNum/$aDen must lie in (0, 1]")
    val s = df.sparkSession
    import s.implicits._
    df.select(col("user_id").cast("long"), col("us").cast("long"),
        col("event_id").cast("long"), col("v_e6").cast("long"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var curUser = 0L
        var ema = 0L
        var rn = 0L
        var started = false
        it.map { case (u, _, id, v) =>
          if (!started || u != curUser) {
            curUser = u; ema = v; rn = 1L; started = true
          } else {
            rn += 1
            ema = (aNum * v + (aDen - aNum) * ema) / aDen
          }
          (u, rn, id, v, ema)
        }
      }
      .toDF("user_id", "rn", "event_id", "v_e6", "ema_e6")
  }
}
