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

  /** Holt's LINEAR-trend smoothing (double exponential smoothing,
    * Holt 1957) — the two-state member of the recurrence family: the
    * EMA tracks a level only and lags any drifting series; Holt adds
    * a trend state so the one-step forecast `level + trend` stays on
    * a moving signal. Same exactness discipline as [[smooth]]: both
    * states are int64 at e6 scale and every step uses truncating
    * division (Scala `/` = DuckDB `//`, identical on all signs — the
    * trend state DOES go negative), so the full (level, trend)
    * trajectory unrolls as a DuckDB RECURSIVE CTE.
    *
    *   l_1 = v_1, b_1 = 0
    *   l_t = (aNum·v_t + (aDen−aNum)·(l_{t−1} + b_{t−1})) / aDen
    *   b_t = (bNum·(l_t − l_{t−1}) + (bDen−bNum)·b_{t−1}) / bDen
    *   fc_t = l_t + b_t          (the one-step-ahead forecast)
    *
    * 100 TB shape: identical to [[smooth]] — one hash shuffle on the
    * key, then an in-partition (us, event_id) sort and a linear scan;
    * state is two longs per open key, partitions never exchange
    * state. Input/output contract mirrors [[smooth]] with the two
    * state columns and the forecast appended.
    */
  def holtLinear(df: DataFrame, aNum: Long, aDen: Long,
                 bNum: Long, bDen: Long): DataFrame = {
    require(aDen > 0 && aNum > 0 && aNum <= aDen,
      s"alpha = $aNum/$aDen must lie in (0, 1]")
    require(bDen > 0 && bNum > 0 && bNum <= bDen,
      s"beta = $bNum/$bDen must lie in (0, 1]")
    val s = df.sparkSession
    import s.implicits._
    df.select(col("user_id").cast("long"), col("us").cast("long"),
        col("event_id").cast("long"), col("v_e6").cast("long"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var curUser = 0L
        var lev = 0L
        var tr = 0L
        var rn = 0L
        var started = false
        it.map { case (u, _, id, v) =>
          if (!started || u != curUser) {
            curUser = u; lev = v; tr = 0L; rn = 1L; started = true
          } else {
            rn += 1
            val prevLev = lev
            lev = (aNum * v + (aDen - aNum) * (prevLev + tr)) / aDen
            tr = (bNum * (lev - prevLev) + (bDen - bNum) * tr) / bDen
          }
          (u, rn, id, v, lev, tr, lev + tr)
        }
      }
      .toDF("user_id", "rn", "event_id", "v_e6", "level_e6", "trend_e6",
        "fc_e6")
  }

  /** FUSED one-pass backtest of the two forecasters: carries BOTH
    * recurrences' states (EMA level; Holt level + trend) through one
    * secondary-sort scan and emits, for every step after the first,
    * the two absolute one-step forecast errors — so the model
    * comparison costs ONE shuffle total instead of two recurrence
    * passes plus a join (the composed form's plan). Arithmetic is
    * bit-identical to running [[smooth]] and [[holtLinear]]
    * separately: same quantization, same truncating updates, the
    * prior step's states read BEFORE either updates.
    * Returns (user_id, rn, eh, ee) for rn ≥ 2 — eh the Holt error
    * |v_t − (l_{t−1} + b_{t−1})|, ee the EMA error |v_t − ema_{t−1}|.
    */
  def backtestErrors(df: DataFrame, aNum: Long, aDen: Long,
                     bNum: Long, bDen: Long): DataFrame = {
    require(aDen > 0 && aNum > 0 && aNum <= aDen,
      s"alpha = $aNum/$aDen must lie in (0, 1]")
    require(bDen > 0 && bNum > 0 && bNum <= bDen,
      s"beta = $bNum/$bDen must lie in (0, 1]")
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
        var lev = 0L
        var tr = 0L
        var rn = 0L
        var started = false
        it.flatMap { case (u, _, _, v) =>
          if (!started || u != curUser) {
            curUser = u; ema = v; lev = v; tr = 0L; rn = 1L
            started = true
            Iterator.empty
          } else {
            rn += 1
            val eh = math.abs(v - (lev + tr))
            val ee = math.abs(v - ema)
            val prevLev = lev
            lev = (aNum * v + (aDen - aNum) * (prevLev + tr)) / aDen
            tr = (bNum * (lev - prevLev) + (bDen - bNum) * tr) / bDen
            ema = (aNum * v + (aDen - aNum) * ema) / aDen
            Iterator.single((u, rn, eh, ee))
          }
        }
      }
      .toDF("user_id", "rn", "eh", "ee")
  }

  /** Streaming-style anomaly flagging over the EMA recurrence — the
    * thresholding pass [[smooth]]'s scaladoc promises: alongside the
    * level EMA, track an EMA of the ABSOLUTE one-step deviation
    * (the robust, quantile-free analogue of a running σ), and flag a
    * row when its deviation from the PRIOR level exceeds
    * `kNum/kDen ×` the prior deviation-EMA plus a floor `minDevE6`
    * (the floor keeps a flat warm-up from flagging every first
    * wobble; the prior-state comparison keeps the flag causal — a
    * spike must not desensitize its own test). Warm-up rows
    * (rn ≤ warmup) are never flagged but still train both states.
    *
    *   flag_t = rn > warmup  ∧  kDen·|v_t − ema_{t−1}|
    *                             > kNum·dev_{t−1} + kDen·minDevE6
    *   dev_t  = (aNum·|v_t − ema_{t−1}| + (aDen−aNum)·dev_{t−1}) / aDen
    *   ema_t  = (aNum·v_t + (aDen−aNum)·ema_{t−1}) / aDen
    *
    * All state is int64/e6 with truncating division and the
    * comparison is cross-multiplied (no division at all), so the flag
    * trajectory is bit-replayable — the property that lets the
    * STREAMED deployment ([[graft.streaming.IncrementalStream
    * .anomalyStream]]) share one oracle with this batch shape.
    * 100 TB shape: identical to [[smooth]]; state is three longs per
    * open key.
    */
  def anomaly(df: DataFrame, aNum: Long, aDen: Long,
              kNum: Long, kDen: Long, minDevE6: Long,
              warmup: Long = 3L): DataFrame = {
    require(aDen > 0 && aNum > 0 && aNum <= aDen,
      s"alpha = $aNum/$aDen must lie in (0, 1]")
    require(kDen > 0 && kNum > 0, s"k = $kNum/$kDen must be positive")
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
        var dev = 0L
        var rn = 0L
        var started = false
        it.map { case (u, _, id, v) =>
          if (!started || u != curUser) {
            curUser = u; ema = v; dev = 0L; rn = 1L; started = true
            (u, rn, id, v, ema, dev, 0)
          } else {
            rn += 1
            val d = math.abs(v - ema)
            val flag =
              if (rn > warmup && kDen * d > kNum * dev + kDen * minDevE6) 1
              else 0
            dev = (aNum * d + (aDen - aNum) * dev) / aDen
            ema = (aNum * v + (aDen - aNum) * ema) / aDen
            (u, rn, id, v, ema, dev, flag)
          }
        }
      }
      .toDF("user_id", "rn", "event_id", "v_e6", "ema_e6", "dev_e6",
        "is_anom")
  }
}
