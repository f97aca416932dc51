package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{AsOfJoin, Graph, Scd}

/** Relational capabilities beyond the reference's surface that a
  * complete engine ships (SURVEY §2.14's absence list made present):
  * as-of join, pivot, deterministic sampling, sketch aggregates.
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** As-of join: each purchase event gains the timestamp of the same
    * user's most recent click at or before it. One shuffle+sort via
    * the union/carry-forward composition ([[graft.ops.AsOfJoin]]) —
    * no range-join explosion.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts").cast("timestamp")).as("click_us"), col("event_id"))
    AsOfJoin.asofBackward(purchases, clicks,
        keyCol = "user_id", timeCol = "ts", payloadCol = "click_us",
        tieBreak = Some("event_id"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("asof_click_us"))
      .orderBy(col("event_id"))
  }

  /** NEAREST as-of ([[graft.ops.AsOfJoin.asofNearest]]) — the
    * direction='nearest' member of the as-of family (backward:
    * `asof_join`; point-in-time interval: `scd2_asof`): every 20th
    * user probed at three OFF-GRID timestamps (day d₀+5/15/25 at
    * 11:37, so the nearest event genuinely differs from the backward
    * one when the next event is closer), each probe attached to that
    * user's closest event in either direction. One keyed shuffle
    * serves both direction carries. The oracle replays the total
    * resolution rule — ORDER BY (|Δt|, t, event_id) LIMIT 1 per
    * probe — so the tie semantics are hash-pinned, not just the
    * happy path.
    */
  def asofNearestQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = Tables.raw(s, dir, "events")
    val ev = raw.select(col("user_id"),
      Tables.microsOf(raw, "ts").as("t_us"), col("event_id"))
    val d0 = ev.agg(min(to_date(timestamp_micros(col("t_us")))).as("d0"))
    val probes = ev.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(20)) === 0)
      .crossJoin(broadcast(d0))
      .crossJoin(Seq(5, 15, 25).toDF("o"))
      .select(col("user_id"),
        (unix_micros(date_add(col("d0"), col("o")).cast("timestamp"))
          + lit(41820000000L)).as("t_us"))
      .withColumn("probe_us", col("t_us"))
    graft.ops.AsOfJoin.asofNearest(probes, ev,
        keyCol = "user_id", timeCol = "t_us", payloadCol = "event_id",
        tieCol = "event_id")
      .select(col("user_id"), col("probe_us"),
        col("asof_event_id").as("nearest_event_id"),
        abs(col("asof_t") - col("probe_us")).as("delta_us"))
      .orderBy(col("user_id"), col("probe_us"))
  }

  /** Pivot: per-user event-type count matrix (fixed column set so the
    * plan is a single hash aggregate, no second pass to discover
    * pivot values).
    */
  def pivotEvents(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
      .orderBy(col("user_id"))
  }

  /** Salted skew join under the correctness gate: events (probe,
    * 10k rows over 150 hot user keys — exactly the shape AQE skew
    * splitting targets) salted ×8 against the replicated customer dim,
    * then aggregated per market segment. The oracle is the PLAIN join:
    * salting must be result-invariant, only the shuffle layout changes.
    */
  def skewJoin(s: SparkSession, dir: String): DataFrame = {
    val probe = t(s, dir, "events")
      .select(col("user_id").as("c_custkey"), col("value"))
    val build = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.ops.Skew.saltedJoin(probe, build, "c_custkey", saltFactor = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** Sessionization: events grouped into per-user sessions split at
    * >30-minute gaps — lag + running-sum window composition (one
    * shuffle on user_id serves both windows and the final aggregate).
    * Computed on integer epoch-MICROsecond longs (the engine-parity
    * granularity — DuckDB truncates the nano parquet column to µs, so
    * both sides divide to µs first) with event_id tie-break for
    * duplicate timestamps.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60L * 1000000L
    val rawEv = Tables.raw(s, dir, "events")
    val e = rawEv
      .select(col("user_id"), Tables.microsOf(rawEv, "ts").as("tsu"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"), col("event_id"))
    e.withColumn("new_sess",
        when(lag(col("tsu"), 1).over(w).isNull ||
          col("tsu") - lag(col("tsu"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("tsu")).as("start_us"), max(col("tsu")).as("end_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** 7-day moving sum per user — the RANGE-frame sliding window (vs
    * `window_running`'s ROWS frame): frame = [tsu − 7d, tsu] on integer
    * epoch-µs. Summation runs in DECIMAL so the result is
    * order-independent (double addition is associative-sensitive and
    * would hash-differ between engines); the exact decimal is cast to
    * double once at the end. Equal-timestamp rows are frame PEERS in
    * both engines, so ties need no extra keying.
    */
  /** Per-user union length of overlapping time intervals (billing /
    * watch-time / utilization dedup — "don't double-count overlapping
    * sessions"): each event opens an interval of `value` minutes
    * (clamped to [0, 24 h], floored to integer µs so both engines
    * compute the identical int64), and the union length is the
    * classic sweep: sort by start within the key, track the running
    * max end over PRECEDING rows, count only the part of each
    * interval past that high-water mark. Everything is a KEYED
    * window (partitioned by user_id) — the scale-safe shape; no
    * global sort, no state beyond the window frame. Float
    * discipline: the only double ops are two multiplies + floor in fixed order, an
    * identical IEEE sequence in Spark and DuckDB; all comparisons and
    * sums are int64.
    */
  def intervalUnion(s: SparkSession, dir: String): DataFrame = {
    val rawEv = Tables.raw(s, dir, "events")
    val e = rawEv
      .select(col("user_id"), col("event_id"),
        Tables.microsOf(rawEv, "ts").as("start_us"),
        expr("CAST(floor(least(greatest(value, 0) * 60, 86400) * 1000000) AS BIGINT)")
          .as("dur_us"))
      .withColumn("end_us", col("start_us") + col("dur_us"))
    val prev = Window.partitionBy(col("user_id"))
      .orderBy(col("start_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("prev_max_end", max(col("end_us")).over(prev))
      .withColumn("covered_us",
        greatest(col("end_us") - greatest(col("start_us"),
          coalesce(col("prev_max_end"), col("start_us"))), lit(0L)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("dur_us")).as("raw_us"),
        sum(col("covered_us")).as("covered_us"),
        (sum(col("dur_us")) - sum(col("covered_us"))).as("overlap_us"))
      .orderBy(col("user_id"))
  }

  /** Per-user EMA smoothing ([[graft.ops.Ema.smooth]], α = 1/4) over
    * the event stream — the SEQUENTIAL-STATE member of the
    * time-series family: each step's int64 truncation feeds the next,
    * so no window/prefix-sum form exists and the physical shape is
    * the secondary sort (one hash shuffle on user_id, then a linear
    * per-partition scan — state is one long per open key). The oracle
    * unrolls the recurrence as a DuckDB RECURSIVE CTE joining step rn
    * to rn+1, so the ENTIRE smoothed trajectory hash-compares — the
    * trained-state discipline applied to streaming-style state.
    */
  def emaSmooth(s: SparkSession, dir: String): DataFrame = {
    val rawEv = Tables.raw(s, dir, "events")
    graft.ops.Ema.smooth(
      rawEv.select(col("user_id"),
        Tables.microsOf(rawEv, "ts").as("us"), col("event_id"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
          .as("v_e6")),
      aNum = 1, aDen = 4)
      .orderBy(col("user_id"), col("rn"))
  }

  /** Per-user Holt linear-trend smoothing ([[graft.ops.Ema
    * .holtLinear]], α = 1/4, β = 1/8) — the TWO-state member of the
    * recurrence family: level + trend, so the one-step forecast
    * `level + trend` tracks a drifting series the plain EMA lags.
    * The trend state goes NEGATIVE on falling series, which is why
    * the truncating-division discipline matters: Scala int64 `/` and
    * DuckDB `//` both truncate toward zero on all signs, so the full
    * (level, trend) trajectory unrolls as a RECURSIVE CTE and
    * hash-compares bit-for-bit.
    */
  def holtLinearQ(s: SparkSession, dir: String): DataFrame = {
    val rawEv = Tables.raw(s, dir, "events")
    graft.ops.Ema.holtLinear(
      rawEv.select(col("user_id"),
        Tables.microsOf(rawEv, "ts").as("us"), col("event_id"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
          .as("v_e6")),
      aNum = 1, aDen = 4, bNum = 1, bDen = 8)
      .orderBy(col("user_id"), col("rn"))
  }

  /** Per-user EMA anomaly flagging ([[graft.ops.Ema.anomaly]],
    * α = 1/4, k = 5/2, floor 0.5 in value units, warm-up 3) — the
    * thresholding pass the smoother exists for: a row is flagged when
    * its deviation from the PRIOR level exceeds k× the prior
    * deviation-EMA plus the floor (causal — a spike never
    * desensitizes its own test). The flag comparison is
    * cross-multiplied, so no division enters the decision and the
    * whole (ema, dev, flag) trajectory replays as a RECURSIVE CTE.
    * `stream_anomaly` shares this oracle verbatim.
    */
  def emaAnomaly(s: SparkSession, dir: String): DataFrame = {
    val rawEv = Tables.raw(s, dir, "events")
    graft.ops.Ema.anomaly(
      rawEv.select(col("user_id"),
        Tables.microsOf(rawEv, "ts").as("us"), col("event_id"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
          .as("v_e6")),
      aNum = 1, aDen = 4, kNum = 5, kDen = 2, minDevE6 = 500000L,
      warmup = 3L)
      .orderBy(col("user_id"), col("rn"))
  }

  /** Forecast BACKTEST — the evaluation the recurrence family exists
    * for: per user, the one-step-ahead MAE of the Holt forecast
    * (level + trend) against the plain EMA's implicit forecast (its
    * level), every error an exact e6 integer (|v_{t+1} − fc_t|,
    * |v_{t+1} − ema_t|), means by truncating DIV, and the
    * model-selection verdict `holt_wins` decided on the raw error
    * SUMS (same denominator — no division enters the comparison).
    * This is the query that justifies deploying the two-state model:
    * it must EARN its extra state on the actual corpus. FUSED
    * physical shape ([[graft.ops.Ema.backtestErrors]]): one linear
    * scan carries BOTH models' states, so the whole comparison costs
    * one shuffle — no second recurrence pass, no join; the oracle
    * runs both recursive chains separately and the hash match proves
    * the fused arithmetic identical. Verdict on this corpus: the
    * events values are trendless, so Holt wins for only ~5% of users
    * — the backtest exists precisely to say "don't deploy the
    * fancier model here".
    */
  def forecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val rawEv = Tables.raw(s, dir, "events")
    val base = rawEv.select(col("user_id"),
      Tables.microsOf(rawEv, "ts").as("us"), col("event_id"),
      floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v_e6"))
    graft.ops.Ema.backtestErrors(base, aNum = 1, aDen = 4,
        bNum = 1, bDen = 8)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_steps"),
        sum(col("eh")).as("sh"), sum(col("ee")).as("se"))
      .selectExpr("user_id", "n_steps",
        "sh DIV n_steps AS holt_mae_e6",
        "se DIV n_steps AS ema_mae_e6",
        "CAST(CASE WHEN sh < se THEN 1 ELSE 0 END AS INT) AS holt_wins")
      .orderBy(col("user_id"))
  }

  /** SEASONALITY detection — the model-selection step BEFORE the
    * recurrence family (deploy a seasonal model only where
    * seasonality exists): per event_type, the daily count series'
    * lag-7 seasonal-naive absolute error against the lag-1 naive
    * error, both exact integer sums over the SAME day set (a row
    * counts only when BOTH predecessors exist — different day sets
    * would silently compare different denominators). Predecessors
    * come from explicit day-arithmetic EQUI-joins, not row-offset
    * `lag` — a missing day would misalign a row-lag by one (the
    * events corpus happens to be day-dense, but the operator must
    * not bet on it). ratio_e6 = ⌊sae7·10⁶ / sae1⌋ < 10⁶ ⇔ the
    * weekly-seasonal forecaster beats naive ⇔ `seasonal` = 1.
    * Scale: ONE corpus scan — the daily aggregate is PINNED
    * (materialize, the inverted_index precedent) because the base
    * plus two lag arms would otherwise re-scan the corpus three
    * times (Spark does not reuse an un-pinned aggregate subtree);
    * everything after runs on the |types × days| table — hundreds of
    * rows at any corpus size, broadcast-joinable by construction.
    */
  def seasonalityStrength(s: SparkSession, dir: String): DataFrame =
    seasonalityFrom(graft.ops.Dedup.materialize(
      t(s, dir, "events")
        .groupBy(col("event_type").as("et"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))))

  /** Autocorrelation function of each event type's daily count
    * series at lags 1 and 7 — the classical time-series diagnostic
    * next to `seasonality_strength`'s MAE-ratio verdict (Box–Jenkins:
    * a weekly cycle shows as acf(7) ≫ acf(1)). Exactness discipline:
    * the six sufficient statistics (m, Σx, Σy, Σx², Σy², Σxy) are
    * exact int64 sums over the lag-joined pairs; the Pearson
    * numerator m·Σxy − Σx·Σy and the two variance terms stay integer
    * (they can be NEGATIVE, so no DIV ever touches them — the κ_e6
    * lesson); only the final r = num / √(dx·dy) goes through doubles,
    * and every step there (int64 < 2⁵³ → exact double, one multiply,
    * one sqrt, one divide, round) is IEEE-correctly-rounded in both
    * engines — sqrt is exactly specified, unlike log. Degenerate
    * series (zero variance on either side) yield NULL. Scale shape:
    * the only corpus-wide shuffle builds the |types × days| daily
    * cell table; each lag leg is a self-join + 6-cell aggregate over
    * those cells, corpus-size-independent.
    */
  def acfDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = graft.ops.Dedup.materialize(
      t(s, dir, "events")
        .groupBy(col("event_type").as("et"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")))
    def leg(k: Int) = {
      val lagged = daily.select(col("et"),
        date_add(col("day"), k).as("day"), col("n").as("nl"))
      daily.join(lagged, Seq("et", "day"))
        .groupBy(col("et"))
        .agg(count(lit(1)).as("m"),
          sum(col("n")).as("sx"), sum(col("nl")).as("sy"),
          sum(col("n") * col("n")).as("sxx"),
          sum(col("nl") * col("nl")).as("syy"),
          sum(col("n") * col("nl")).as("sxy"))
        .withColumn("lag", lit(k))
    }
    leg(1).unionByName(leg(7))
      .selectExpr("et AS event_type", "CAST(lag AS INT) AS lag", "m",
        "m * sxy - sx * sy AS num",
        "m * sxx - sx * sx AS dx",
        "m * syy - sy * sy AS dy")
      .withColumn("acf_r",
        when(col("dx") > 0 && col("dy") > 0,
          round(col("num").cast("double") /
            sqrt(col("dx").cast("double") * col("dy").cast("double")), 4)))
      .select(col("event_type"), col("lag"), col("m"), col("num"),
        col("acf_r"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Per-type OLS trend of the daily count series — the REGRESSION
    * member next to `acf_daily`'s correlation diagnostic (is traffic
    * growing, and how fast?): slope = (m·Σxy − Σx·Σy)/(m·Σx² − (Σx)²)
    * with x = epoch day, y = daily count. Same exactness discipline
    * as ACF: the five sufficient statistics are int64 sums over the
    * |types × days| cells (epoch days ~2·10⁴ keep the x-side products
    * small — x is TIME, not volume; past ~10⁹ events/type/day the
    * num·10⁶ scaling below goes DECIMAL(38,0), the corpus_drift
    * widening rule), the numerator/denominator stay integer, and the reported
    * slope_e6 (counts/day ×10⁶) divides |num| with the sign
    * re-applied (the κ_e6 rule — slopes are signed). A final
    * `trending` verdict (slope > 0) makes the monitor thresholdable.
    */
  def trendDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(col("event_type"), datediff(col("day"),
        lit(java.sql.Date.valueOf("1970-01-01"))).cast("long").as("x"),
        col("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .selectExpr("event_type", "m",
        "m * sxy - sx * sy AS num", "m * sxx - sx * sx AS den")
      .selectExpr("event_type", "m", "num",
        """CAST(CASE WHEN den = 0 THEN NULL
                     WHEN num >= 0 THEN (num * 1000000) DIV den
                     ELSE -(((-num) * 1000000) DIV den)
                END AS BIGINT) AS slope_e6""",
        "CAST(CASE WHEN num > 0 THEN 1 ELSE 0 END AS INT) AS trending")
      .orderBy(col("event_type"))

  /** The post-daily arithmetic shared by `seasonality_strength` and
    * its streamed deployment `stream_seasonal` (which maintains the
    * SAME (et, day, n) cells incrementally): lag joins + per-type
    * error sums over whatever daily table the caller maintained.
    */
  private def seasonalityFrom(daily: DataFrame): DataFrame = {
    def lagged(k: Int, as: String) = daily.select(col("et"),
      date_add(col("day"), k).as("day"), col("n").as(as))
    daily
      .join(lagged(1, "n1"), Seq("et", "day"))
      .join(lagged(7, "n7"), Seq("et", "day"))
      .groupBy(col("et").as("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n") - col("n1"))).as("sae1"),
        sum(abs(col("n") - col("n7"))).as("sae7"))
      .selectExpr("event_type", "n_days", "sae1", "sae7",
        "CASE WHEN sae1 = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE (sae7 * 1000000) DIV sae1 END AS ratio_e6",
        "CAST(CASE WHEN sae7 < sae1 THEN 1 ELSE 0 END AS INT) " +
          "AS seasonal")
      .orderBy(col("event_type"))
  }

  /** The FOURTEENTH driver-visible stream shape — seasonality
    * detection maintained FROM the stream: events replayed as ≥2 real
    * micro-batches, each batch reduced to its (event_type, day, n)
    * count cells and PERSISTED to the batch-id-keyed parquet store
    * (the [[graft.ops.Manifest.writeBatchCells]] idempotence/
    * durability discipline the 13th shape established — counts are
    * additive, so the merged daily table equals the batch recompute
    * regardless of how arrivals split). The final lag-join arithmetic
    * runs over the merged |types × days| cells and SHARES
    * `seasonality_strength`'s oracle verbatim — the cross-batch
    * daily merge is hash-verified through the seasonal verdicts
    * themselves. This is how a metrics pipeline keeps its
    * model-selection signal current without re-scanning history.
    */
  def streamSeasonal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val store = java.nio.file.Files
      .createTempDirectory("graft_seasonal").toString
    val stream = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val persistBatch: (DataFrame, Long) => Unit = (batch, id) => {
      val cells = batch
        .groupBy(col("event_type").as("et"),
          to_date(Tables.eventTimeOf(schema, "ts")).as("day"))
        .agg(count(lit(1)).as("n")).persist()
      try {
        if (cells.count() > 0) batches.incrementAndGet()
        graft.ops.Manifest.writeBatchCells(cells, store, id)
      } finally cells.unpersist()
    }
    val q = stream.writeStream.foreachBatch(persistBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    require(batches.get() >= 2,
      s"stream_seasonal expected >=2 non-empty micro-batches, got " +
        batches.get())
    val daily = s.read.parquet(store)
      .groupBy(col("et"), col("day")).agg(sum(col("n")).as("n"))
    // pin before deleting the temp cell store (same store-lifetime
    // rule as stream_manifest: no lazy read of a deleted directory,
    // no leaked disk per run)
    val out = graft.ops.Dedup.materialize(seasonalityFrom(daily))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    out
  }

  /** The FIFTEENTH driver-visible stream shape — approximate
    * DISTINCT-count maintained FROM the stream: events replayed as
    * ≥2 real micro-batches, each batch reduced to its house-HLL
    * register cells ([[graft.ops.Hll.registers]] — plain
    * (event_type, bucket, ρmax) integer rows) and PERSISTED to the
    * batch-id-keyed parquet store (the [[graft.ops.Manifest
    * .writeBatchCells]] idempotence/durability discipline the
    * manifest and seasonal shapes established). Registers merge by
    * MAX, so the running sketch over the tiny cell store equals the
    * one-pass batch sketch BIT FOR BIT regardless of how arrivals
    * split — the final estimate SHARES `approx_distinct`'s oracle
    * chain verbatim (the stream_ema shared-oracle discipline). This
    * is how an ingest keeps a distinct-users dashboard current
    * without re-scanning history: per batch one register reduction
    * over only the arriving rows, state = |groups| × ≤1024 integer
    * cells per batch.
    */
  def streamDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val store = java.nio.file.Files
      .createTempDirectory("graft_hllstore").toString
    val stream = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val persistBatch: (DataFrame, Long) => Unit = (batch, id) => {
      val cells = graft.ops.Hll.registers(
        batch.select(col("event_type"), col("user_id")),
        Seq("event_type"), col("user_id"), salt = 777000L).persist()
      try {
        if (cells.count() > 0) batches.incrementAndGet()
        graft.ops.Manifest.writeBatchCells(cells, store, id)
      } finally cells.unpersist()
    }
    val q = stream.writeStream.foreachBatch(persistBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    require(batches.get() >= 2,
      s"stream_distinct expected >=2 non-empty micro-batches, got " +
        batches.get())
    val regs = s.read.parquet(store)
      .groupBy(col("event_type"), col("bucket")).agg(max(col("r")).as("r"))
    val est = graft.ops.Hll.estimate(regs, Seq("event_type"),
      "approx_users")
    val exact = t(s, dir, "events").groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    // pin before deleting the temp cell store (the stream_manifest
    // store-lifetime rule)
    val out = graft.ops.Dedup.materialize(
      est.join(exact, Seq("event_type")).orderBy(col("event_type")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    out
  }

  /** The SIXTEENTH driver-visible stream shape — the quantile
    * HISTOGRAM ([[quantileHist]]'s mergeable form) maintained FROM
    * the stream: each micro-batch reduces to its per-(event_type,
    * value-bin) count cells and persists them to the batch-id-keyed
    * store (the manifest/seasonal/HLL durability discipline). Counts
    * merge by ADDITION, so the merged histogram equals the batch
    * recompute regardless of arrival split and the rank-edge p50/p90
    * estimates hash-check against a plain batch oracle. With
    * `stream_distinct` this closes the pair a streaming metrics
    * pipeline actually runs: distinct-users AND latency/value
    * percentiles per key, both as tiny mergeable cell stores, history
    * never re-scanned.
    */
  def streamQuantile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val store = java.nio.file.Files
      .createTempDirectory("graft_qhist").toString
    val stream = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val persistBatch: (DataFrame, Long) => Unit = (batch, id) => {
      // FLOOR division (not Spark's trunc-toward-zero DIV): division
      // by a power of two is exact in doubles, so floor(x/512.0)
      // equals DuckDB's integer `//` for NEGATIVE cents too — the
      // engines would diverge under DIV if values ever went negative
      val cells = batch
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("event_type"),
          floor(col("cents") / lit(512.0)).cast("long").as("bin"))
        .agg(count(lit(1)).as("c")).persist()
      try {
        if (cells.count() > 0) batches.incrementAndGet()
        graft.ops.Manifest.writeBatchCells(cells, store, id)
      } finally cells.unpersist()
    }
    val q = stream.writeStream.foreachBatch(persistBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    require(batches.get() >= 2,
      s"stream_quantile expected >=2 non-empty micro-batches, got " +
        batches.get())
    val counts = s.read.parquet(store)
      .groupBy(col("event_type"), col("bin")).agg(sum(col("c")).as("c"))
    val cum = counts
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("event_type")).orderBy(col("bin"))))
      .withColumn("n", sum(col("c"))
        .over(Window.partitionBy(col("event_type"))))
    val out = graft.ops.Dedup.materialize(cum.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("bin")))
          .as("b50"),
        min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("bin")))
          .as("b90"))
      .select(col("event_type"), col("n"),
        (col("b50") * 512).as("p50_bin_cents"),
        (col("b90") * 512).as("p90_bin_cents"))
      .orderBy(col("event_type")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    out
  }

  /** The EIGHTEENTH driver-visible stream shape — a TOP-K dashboard
    * maintained FROM the stream: per micro-batch the arriving rows
    * reduce to (event_type, user_id, n) count cells persisted to the
    * batch-id-keyed store; counts merge by ADDITION, so the merged
    * table equals the batch recompute for ANY arrival split, and the
    * rank is taken AT READ over the merged cells (rank is not
    * mergeable — ranking inside a batch would bake arrival order into
    * state; the cells are, which is why this shape stores counts and
    * derives top-3). The bounded-state alternative (a SpaceSaving
    * summary per batch — [[topkFreq]]'s aggregator) caps state at
    * O(capacity) but its merged CONTENTS are arrival-order-dependent,
    * so the exact cell form is the hash-replayable one; at true scale
    * the cell store is |key × active entities| per batch and a
    * pre-cap (drop n = 1 cells before persist, re-admit on re-arrival)
    * bounds it without changing any top-3 that matters. Completes the
    * streaming metrics triple: distinct (`stream_distinct`),
    * percentiles (`stream_quantile`), leaders (this).
    */
  def streamTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    // 3-batch contract (r12): the cell-merge algebra is batch-count
    // invariant, so a third real micro-batch strengthens the proof at
    // one spin-up's cost
    val stage = stageEventsTimeSplit(s, dir, n = 3)
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val store = java.nio.file.Files
      .createTempDirectory("graft_topkstore").toString
    val stream = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val persistBatch: (DataFrame, Long) => Unit = (batch, id) => {
      val cells = batch.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n")).persist()
      try {
        if (cells.count() > 0) batches.incrementAndGet()
        graft.ops.Manifest.writeBatchCells(cells, store, id)
      } finally cells.unpersist()
    }
    val q = stream.writeStream.foreachBatch(persistBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    require(batches.get() >= 3,
      s"stream_topk expected >=3 non-empty micro-batches, got " +
        batches.get())
    val merged = s.read.parquet(store)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("n")).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("user_id"))
    // pin before deleting the temp cell store (the stream_manifest
    // store-lifetime rule)
    val out = graft.ops.Dedup.materialize(merged
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("event_type"), col("rnk"), col("user_id"), col("n"))
      .orderBy(col("event_type"), col("rnk")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    out
  }

  def movingSum7d(s: SparkSession, dir: String): DataFrame = {
    val sevenDaysUs = 7L * 86400L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
      .rangeBetween(-sevenDaysUs, 0)
    val rawEv = Tables.raw(s, dir, "events")
    rawEv
      .select(col("user_id"), col("event_id"),
        Tables.microsOf(rawEv, "ts").as("tsu"), col("value"))
      .withColumn("mv7",
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("tsu"), col("mv7"))
      .orderBy(col("user_id"), col("tsu"), col("event_id"))
  }

  /** Quantile sketch gate: exact rank-based p50/p90 of order totals
    * per priority (integer-exact rank selection: ceil(p·n) over the
    * sorted multiset — tie-permutation-independent because ordering is
    * by value alone), with `percentile_approx` (GK sketch) required to
    * land within 1% of exact. The sketch estimate itself isn't
    * SQL-portable, so — like the HLL gate — the oracle recomputes the
    * exact percentiles and pins `bound_met = 1` per group.
    */
  def percentileBound(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val byP = Window.partitionBy(col("o_orderpriority"))
    val ranked = o
      .select(col("o_orderpriority"), col("o_totalprice"))
      .withColumn("rn", row_number().over(byP.orderBy(col("o_totalprice"))))
      .withColumn("n", count(lit(1)).over(byP))
    // rank positions via integer ceil division — no float rank math
    // (ceil(0.9 * n) in doubles can round across an integer boundary
    // differently per engine)
    val exact = ranked.groupBy(col("o_orderpriority")).agg(
      max(when(col("rn") === expr("(n + 1) DIV 2"),
        col("o_totalprice"))).as("p50"),
      max(when(col("rn") === expr("(9 * n + 9) DIV 10"),
        col("o_totalprice"))).as("p90"))
    val approx = o.groupBy(col("o_orderpriority")).agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("a50"),
      percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("a90"))
    exact.join(approx, Seq("o_orderpriority"))
      .select(col("o_orderpriority"),
        round(col("p50") * 100).cast("long").as("p50_cents"),
        round(col("p90") * 100).cast("long").as("p90_cents"),
        (abs(col("a50") - col("p50")) * 100 <= col("p50") &&
          abs(col("a90") - col("p90")) * 100 <= col("p90"))
          .cast("int").as("bound_met"))
      .orderBy(col("o_orderpriority"))
  }

  /** Mergeable QUANTILE sketch with REPLAYABLE estimates — the
    * quantile member of the house sketch family (HLL `approx_
    * distinct`, CMS `cms_freq`, SpaceSaving `topk_freq`, Bloom
    * `bloom_house`): an equi-width histogram over order totals in
    * cents, bin = cents DIV 2¹⁴, so sketch state is bounded by
    * ~3.7k count cells per group REGARDLESS of value cardinality
    * (where `median_exact`'s bounded-domain counting needs |distinct
    * values|) and sketches MERGE by plain addition — the incremental
    * rollup shape. The estimate is the lower edge of the bin holding
    * the integer ceil rank (the `percentile_bound` rank discipline) —
    * all integer arithmetic, so the APPROXIMATE VALUES hash-compare
    * cross-engine, where GK/t-digest summaries are engine-specific
    * and `percentile_bound` can only gate them. Error ≤ one bin
    * width (163.84 USD, ~0.1% at the p50 scale); the cumulative
    * window runs over |groups × bins| cells, never rows.
    */
  def quantileHist(s: SparkSession, dir: String): DataFrame = {
    // floor division via exact power-of-two double division — equals
    // DuckDB's `//` for any sign, where Spark's DIV truncates toward
    // zero and would diverge on negative cents (see streamQuantile)
    val counts = t(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("g"),
        floor(col("cents") / lit(16384.0)).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("g")).orderBy(col("bin"))))
      .withColumn("n", sum(col("c"))
        .over(Window.partitionBy(col("g"))))
    cum.groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n + 1) DIV 2"), col("bin")))
          .as("b50"),
        min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("bin")))
          .as("b90"))
      .select(col("g").as("o_orderpriority"), col("n"),
        (col("b50") * 16384).as("p50_bin_cents"),
        (col("b90") * 16384).as("p90_bin_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** Robust outlier detection by median / MAD (Hampel's rule,
    * |v − med| > 3·MAD) — the monitoring family's robust member:
    * mean/stddev anomaly gates ([[emaAnomaly]], `anomaly_events`)
    * move with the outliers they hunt, while the median absolute
    * deviation has a 50% breakdown point. Both medians (value, then
    * deviation) come from the bounded-domain counting pattern
    * ([[graft.queries.TextQueries.medianExact]]'s discipline): count
    * per (event_type, cents) CELL, cumulate cells, pick the lower
    * median by the explicit (n+1) DIV 2 rank rule — then the
    * deviation pass re-bins the SAME cell table around the median
    * (|cents − med| collides symmetric pairs, so cells re-aggregate
    * before cumulating) and the outlier count weighs cells, never
    * rows. One corpus scan total; every shuffle after it carries
    * |value domain| cells per group. All-integer (cents), so the
    * flag threshold 3·MAD compares exactly on both engines.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val cells = graft.ops.Dedup.materialize(
      t(s, dir, "events")
        .select(col("event_type"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("c")))
    def lowerMedian(cs: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cs.withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c"))
          .over(Window.partitionBy(col("event_type"))))
        .filter(col("cum") >= expr("(n + 1) DIV 2"))
        .groupBy(col("event_type"))
        .agg(min(col(v)).as(out), max(col("n")).as("n"))
    }
    val med = lowerMedian(cells, "cents", "med_cents")
    val dev = cells.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"),
        abs(col("cents") - col("med_cents")).as("dev"), col("c"))
      .groupBy(col("event_type"), col("dev"))
      .agg(sum(col("c")).as("c"))
    val mad = lowerMedian(dev, "dev", "mad_cents")
      .drop("n")
    dev.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("med_cents")).as("med_cents"),
        max(col("mad_cents")).as("mad_cents"),
        sum(when(col("dev") > col("mad_cents") * 3, col("c"))
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Balanced RANGE output sharding with boundaries from the
    * mergeable quantile histogram — what a quantile sketch is FOR
    * inside an engine: Spark's RangePartitioner places boundaries by
    * reservoir SAMPLING (approximate and nondeterministic under
    * retries); here the K−1 boundaries are read off the same integer
    * histogram cells as `quantile_hist` (boundary_j = the lowest bin
    * whose cumulative count reaches ⌈j·n/K⌉), so placement is
    * deterministic, MERGEABLE (cells add — the boundaries for
    * old ∪ delta need no rescan of history), and fully
    * SQL-replayable. Rows are assigned by BIN (shard = number of
    * boundaries ≤ the row's bin, a scan-stage comparison against the
    * ≤K−1 collected boundary literals), so every bin lands wholly in
    * one shard: shard sizes balance to within one bin's population
    * and shard ranges are provably disjoint (assignment is monotone
    * in the bin id). A megabin spanning several rank targets empties
    * the intermediate shards — the histogram's resolution limit,
    * visible in the output rather than silently rebalanced. Output:
    * per-shard row count and [min, max] cents.
    */
  def rangeShard(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val rows = t(s, dir, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
        .as("cents"))
      .withColumn("bin", floor(col("cents") / lit(16384.0)).cast("long"))
    val hist = rows.groupBy(col("bin")).agg(count(lit(1)).as("c"))
    // global cumulative over |bins| CELLS (≤ domain/2¹⁴ — bounded by
    // the quantile_hist state contract), never rows
    val cum = hist
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("bin"))))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(lit(1))))
    val js = s.range(1, k).select(col("id").as("j"))
    // bounded collect: exactly K−1 boundary bins by construction
    val bs = cum.crossJoin(broadcast(js))
      .filter(col("cum") >= expr(s"(j * n + $k - 1) DIV $k"))
      .groupBy(col("j")).agg(min(col("bin")).as("b"))
      .orderBy(col("j")).collect().map(_.getLong(1)).toSeq
    rows
      .withColumn("shard_id",
        size(filter(typedLit(bs), b => b <= col("bin"))))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .orderBy(col("shard_id"))
  }

  /** INCREMENTAL boundary maintenance for [[rangeShard]] — the
    * mergeability claim driven end to end rather than asserted: the
    * histogram cells are built SEPARATELY on the pre-cutoff and
    * post-cutoff order partitions (the `hll_incremental` old ⊕ delta
    * shape), added per bin, and the K−1 boundaries + shard stats read
    * from the merged cells. Counts merge by plain addition, so the
    * result is BIT-IDENTICAL to the one-pass computation — this query
    * shares `range_shard`'s oracle verbatim, and the hash proves in
    * one check that a nightly delta updates the shard map without
    * rescanning history.
    */
  def rangeShardDelta(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val rows = t(s, dir, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
        .as("cents"),
        col("o_orderdate"))
      .withColumn("bin", floor(col("cents") / lit(16384.0)).cast("long"))
    val cutoff = lit("1997-06-01")
    def cells(part: DataFrame): DataFrame =
      part.groupBy(col("bin")).agg(count(lit(1)).as("c"))
    val hist = cells(rows.filter(col("o_orderdate") < cutoff))
      .unionByName(cells(rows.filter(col("o_orderdate") >= cutoff)))
      .groupBy(col("bin")).agg(sum(col("c")).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("bin"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
    val js = s.range(1, k).select(col("id").as("j"))
    val bs = cum.crossJoin(broadcast(js))
      .filter(col("cum") >= expr(s"(j * n + $k - 1) DIV $k"))
      .groupBy(col("j")).agg(min(col("bin")).as("b"))
      .orderBy(col("j")).collect().map(_.getLong(1)).toSeq
    rows
      .withColumn("shard_id",
        size(filter(typedLit(bs), b => b <= col("bin"))))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .orderBy(col("shard_id"))
  }

  /** Z-order (Morton) layout key over the lineitem (part, supplier)
    * dimensions — the sort key [[graft.ops.Sink.zorderedSave]] lays
    * files out by. Value-checked: DuckDB recomputes the bit interleave
    * with a 16-term list comprehension per dimension.
    */
  def zorderKey(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.dsl.zorder_key
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        zorder_key(pmod(col("l_partkey"), lit(65536)),
          pmod(col("l_suppkey"), lit(65536))).as("zkey"))
      .orderBy(col("zkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Hilbert-curve layout key over the same (partkey, suppkey) plane
    * as `zorder_key` — the locality-superior space-filling curve
    * (consecutive keys are ALWAYS Manhattan-1 grid neighbors, where
    * Z-order jumps the plane at quadrant seams, so an hkey file range
    * never spans far-apart boxes; HilbertSpec proves the
    * bijection + unit-step property against an independent inverse
    * walk and measures the locality win over zkey directly).
    * Scan-stage codegen kernel ([[graft.functions.Kernels.hilbert2]]);
    * the oracle unrolls all 16 rotation levels of the xy2d walk —
    * pure integer CASE/XOR arithmetic — so every key value is
    * recomputed, not contract-checked. Layout usage mirrors
    * `zorder_key`: write files sorted by hkey
    * ([[graft.ops.Sink.zorderedSave]] with this key), get tight
    * min/max on BOTH dimensions.
    */
  def hilbertKey(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.dsl.hilbert_key
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        hilbert_key(pmod(col("l_partkey"), lit(65536)),
          pmod(col("l_suppkey"), lit(65536))).as("hkey"))
      .orderBy(col("hkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** INCREMENTAL PageRank maintenance — warm-start power iteration
    * ([[graft.ops.Graph.pageRankE12]]'s `seedOpt`): after a delta
    * edge batch arrives, resume from the OLD graph's converged ranks
    * instead of uniform, and measure the iteration savings EXACTLY.
    * The old graph drops the lineitem rows ≡ 0 mod 7 before the
    * distinct edge set; its 3-iteration ranks seed ONE iteration on
    * the full graph (`l1_warm_e12` = L1 distance to the full graph's
    * 6-iteration reference), raced against one COLD iteration from
    * uniform (`l1_cold_e12`). Everything is the e12 integer
    * recurrence, so all three trajectories — old 3 iters, warm 1,
    * cold 1, reference 6 — replay in the oracle and both distances
    * hash-compare; `warm_wins` is recomputed there too, and a loud
    * in-engine require pins the operator's reason to exist. Honest
    * cost statement: each warm iteration still touches every edge —
    * the saving is ITERATION COUNT (measured 5-9× closer to the
    * fixed point here), not sublinear delta work; true O(|Δ|) PR
    * needs Monte-Carlo/Gauss–Southwell machinery out of scope.
    *
    * Stored state (r13, the dedup-rebase discipline): the old graph's
    * converged ranks ARE round-N maintained state — a warm-start
    * exists precisely because they were persisted — and the
    * 6-iteration reference is the certification harness, so both
    * (plus the edge tables) memoize per (session, dir) like
    * [[graft.queries.ScaleQueries]]'s label memos. What the query
    * then EXECUTES per round is the maintenance stage itself: one
    * warm iteration, one cold iteration, two L1 cells (was the
    * single largest bench resident at 10.25 s — 11 regenerated
    * power-iteration rounds per run).
    */
  def pagerankDelta(s: SparkSession, dir: String): DataFrame = {
    def directedEdges(pred: Column) = t(s, dir, "orders")
      .join(t(s, dir, "lineitem").filter(pred),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1L << 40) + col("l_suppkey")).as("dst"))
      .distinct()
    // pin the shared frames: the full edge build (orders ⋈ lineitem →
    // distinct → symmetrize) feeds THREE pageRankE12 calls and the old
    // ranks / reference tables are each consumed by multiple actions
    // (two L1 aggregates + the node count) — unpinned, the 6-iteration
    // reference chain re-executed once per action (measured: 17 s →
    // ~7 s for the whole query at sf0.1)
    val oldE = graft.SessionMemo.getOrCompute(s,
      s"prdelta-olde:${graft.Tables.versioned(dir)}",
      graft.ops.Dedup.materialize(
        Graph.symmetrize(directedEdges(col("l_orderkey") % 7 =!= 0))))
    val fullE = graft.SessionMemo.getOrCompute(s,
      s"prdelta-fulle:${graft.Tables.versioned(dir)}",
      graft.ops.Dedup.materialize(
        Graph.symmetrize(directedEdges(lit(true)))))
    val oldRanks = graft.SessionMemo.getOrCompute(s,
      s"prdelta-old:${graft.Tables.versioned(dir)}",
      graft.ops.Dedup.materialize(
        Graph.pageRankE12(oldE, iters = 3, assumeDistinct = true)))
    val ref = graft.SessionMemo.getOrCompute(s,
      s"prdelta-ref:${graft.Tables.versioned(dir)}",
      graft.ops.Dedup.materialize(
        Graph.pageRankE12(fullE, iters = 6, assumeDistinct = true)
          .select(col("id"), col("rank_e12").as("ref_r"))))
    def l1(run: DataFrame): Long = run
      .join(ref, Seq("id"))
      .agg(sum(abs(col("rank_e12") - col("ref_r"))))
      .head().getLong(0)
    val l1Warm = l1(Graph.pageRankE12(fullE, iters = 1,
      assumeDistinct = true, seedOpt = Some(oldRanks)))
    val l1Cold = l1(Graph.pageRankE12(fullE, iters = 1,
      assumeDistinct = true))
    require(l1Warm < l1Cold,
      s"warm start must beat cold ($l1Warm vs $l1Cold) — the operator's contract")
    val n = ref.count()
    import s.implicits._
    Seq((n, l1Warm, l1Cold, 1))
      .toDF("n_nodes", "l1_warm_e12", "l1_cold_e12", "warm_wins")
  }

  /** Staged copy of `events` for [[dppJoin]]: the fact laid out
    * `partitionBy(event_type)` (the K1 sink's dynamic-partition
    * layout) next to a 5-row event-type weight dim — cached per dir
    * (the events stage-cache pattern; immutable inputs, fixed-data
    * assumption as everywhere).
    */
  private val dppStageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def dppStage(s: SparkSession, dir: String): String =
    dppStageCache.computeIfAbsent(Tables.versioned(dir), _ => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_dpp").toString
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type"))
        .write.partitionBy("event_type").parquet(s"$out/fact")
      s.createDataFrame(Seq(("click", 1L), ("error", 9L),
          ("purchase", 3L), ("signup", 7L), ("view", 8L)))
        .toDF("event_type", "w")
        .write.parquet(s"$out/dim")
      out
    })

  /** Dynamic partition pruning: the partitioned fact joins a FILTERED
    * weight dim, and Catalyst's PartitionPruning rule reuses the dim's
    * broadcast as a runtime partition filter on the fact scan
    * (`PartitionFilters: [.. dynamicpruning#..]`, pinned in PlanSpec)
    * — only the 3 surviving partition directories are ever read, with
    * no partition predicate spelled in the query. At 100 TB this is
    * the date-/tenant-partitioned fact ⋈ filtered dim shape: the scan
    * cost tracks the dim's selectivity, not the table size.
    */
  def dppJoin(s: SparkSession, dir: String): DataFrame = {
    val stage = dppStage(s, dir)
    val fact = s.read.parquet(s"$stage/fact")
    val dim = s.read.parquet(s"$stage/dim").filter(col("w") <= 7)
    fact.join(broadcast(dim), Seq("event_type"))
      .groupBy(col("event_type"), col("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("event_type"), col("n_events"),
        (col("cents") * col("w")).as("weighted_cents"))
      .orderBy(col("event_type"))
  }

  /** Deterministic 1-in-10ish sample: md5 prefix compare — the same
    * rows are selected by any engine, any partitioning, any run
    * (unlike TABLESAMPLE/rand, which are seed- and plan-dependent).
    */
  def sampleDeterministic(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(substring(md5(col("event_id").cast("string").cast("binary")),
        1, 2) <= "19")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))

  /** Sketch aggregates: HOUSE HyperLogLog ([[graft.ops.Hll]])
    * approximate distinct users per type next to the exact count — a
    * full replacement for the engine-specific HLL++
    * (`approx_count_distinct`) whose register state no other engine
    * can replay. Every sketch step is a plain integer aggregate both
    * engines compute identically, so the ESTIMATE itself is
    * oracle-checked bit for bit (this was the suite's only rows-only
    * resident through round 9).
    *
    * Scale shape: the distinct (group, user) projection is pinned
    * once and feeds both the sketch (shuffle carries at most
    * groups × 1024 register cells) and the exact companion the
    * accuracy gate compares against — a production rollup would keep
    * only the sketch arm. Accuracy: ≤ 2.7% on events at every test
    * SF (gated at 5% by `approx_distinct_bound`); raw-regime behavior
    * covered by HllSpec up to 5·10⁵ distinct keys.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ops.Dedup.materialize(
      t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct())
    val est = graft.ops.Hll.distinctCount(pairs, Seq("event_type"),
      col("user_id"), salt = 777000L, outCol = "approx_users")
    val exact = pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_users"))
    est.join(exact, Seq("event_type")).orderBy(col("event_type"))
  }

  /** Driver-visible accuracy gate for [[approxDistinct]]: asserts
    * every group's house-HLL estimate is within 5% of the exact
    * distinct count (measured relative error ≤ 2.7% at every test
    * SF). Since round 10 the estimate itself is ALSO value-checked
    * (the house sketch replays in DuckDB SQL); the gate remains as
    * the semantic accuracy contract — a bit-equal wrong estimator
    * would still hash-match, the 5% envelope is what makes it an
    * approximate-distinct OPERATOR.
    */
  def approxDistinctBound(s: SparkSession, dir: String): DataFrame =
    approxDistinct(s, dir)
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(abs(col("approx_users") - col("exact_users")) * 100
                   <= col("exact_users") * 5, 0L).otherwise(1L)).as("__viol"))
      // sum over zero groups is NULL: coalesce so an empty input
      // passes vacuously instead of NULL-failing the gate
      .select(col("n_groups"), lit(5).as("err_bound_pct"),
        when(coalesce(col("__viol"), lit(0L)) === 0, 1)
          .otherwise(0).as("all_within"))

  /** Incremental DISTINCT-count maintenance via the house HLL's
    * mergeable registers ([[graft.ops.Hll]] — r10, replacing the
    * DataSketches blob whose estimate no other engine could replay) —
    * the gap [[graft.ops.Incremental.aggState]] cannot cover:
    * count-distinct is not algebraic, so the incremental-rollup
    * pattern needs state that re-aggregates. Per-month registers are
    * built SEPARATELY on the old and delta order partitions and
    * merged by max per (month, bucket); max-merge is exactly the
    * one-pass sketch by construction, so the DuckDB oracle replays
    * the ONE-PASS estimate and the hash proves, in one check, both
    * merge consistency (old ⊕ Δ ≡ one pass) and cross-engine
    * replayability of every per-month ESTIMATE — strictly stronger
    * than the old pinned-flag gate form. Accuracy stays a loud
    * in-engine contract (`require`, the requireMultiBatch style):
    * mean per-month relative error ≤ 5% (measured ≤ 2.1% at every
    * test SF; individual small months run up to ~9% ≈ 2.8σ at
    * m = 1024, which is why the semantic bound is on the mean).
    *
    * At 100 TB the old side is |months| × ≤1024 plain integer
    * register ROWS (not opaque blobs — queryable, diffable, and
    * mergeable in any engine); the nightly rollup reads the delta
    * partition only, never the history.
    */
  def hllIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Hll
    val orders = t(s, dir, "orders").select(
      date_trunc("month", col("o_orderdate")).cast("date").as("month"),
      col("o_custkey"), col("o_orderdate"))
    val cutoff = lit("1997-06-01")
    def regs(part: DataFrame): DataFrame =
      Hll.registers(part, Seq("month"), col("o_custkey"), salt = 424242L)
    val merged = regs(orders.filter(col("o_orderdate") < cutoff))
      .unionByName(regs(orders.filter(col("o_orderdate") >= cutoff)))
      .groupBy(col("month"), col("bucket")).agg(max(col("r")).as("r"))
    val est = Hll.estimate(merged, Seq("month"), "est_users")
    val exact = orders.groupBy(col("month"))
      .agg(countDistinct(col("o_custkey")).as("exact_users"))
    val out = graft.ops.Dedup.materialize(
      est.join(exact, Seq("month")).orderBy(col("month")))
    val meanErr = out
      .agg(avg(abs(col("est_users") - col("exact_users"))
        / col("exact_users"))).head().getDouble(0)
    require(meanErr <= 0.05,
      f"hll_incremental: mean per-month relative error $meanErr%.4f " +
        "breaches the 5% accuracy contract")
    out
  }

  /** SLIDING-WINDOW distinct users (trailing 7 days) via house-HLL
    * register algebra — the query that shows WHY the registers are
    * worth storing: sliding distinct counts are not algebraic (a
    * day's contribution can't be subtracted back out), so the exact
    * form re-scans every window; with per-day REGISTERS the trailing
    * week is a max-merge of 7 tiny cell sets — the Druid/ClickHouse
    * HLL-column pattern. Engine side: per-(day, bucket) registers
    * built once (|days| × ≤1024 cells), each day's cells EXPANDED to
    * the ≤7 target days they serve, max-merged per target, estimated.
    * max-over-union ≡ max-of-maxes, so the oracle's one-pass chain
    * over the expanded (target, user) pair set computes the identical
    * registers — the estimate hash-compares. The exact companion
    * (corpus × 7 expansion) rides for the accuracy story; production
    * drops it — that is the point.
    */
  def hllSliding(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Hll
    val pairs = graft.ops.Dedup.materialize(
      t(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct())
    val days = pairs.select(col("day")).distinct()
      .withColumnRenamed("day", "target")
    val regs = Hll.registers(pairs, Seq("day"), col("user_id"),
      salt = 777000L)
    val merged = regs
      .withColumn("target",
        explode(sequence(col("day"), date_add(col("day"), 6))))
      .join(broadcast(days), Seq("target"))
      .groupBy(col("target"), col("bucket")).agg(max(col("r")).as("r"))
    val est = Hll.estimate(merged, Seq("target"), "approx_users_7d")
    val exact = pairs
      .withColumn("target",
        explode(sequence(col("day"), date_add(col("day"), 6))))
      .join(broadcast(days), Seq("target"))
      .select(col("target"), col("user_id")).distinct()
      .groupBy(col("target")).agg(count(lit(1)).as("exact_users_7d"))
    est.join(exact, Seq("target"))
      .select(col("target").as("day"), col("approx_users_7d"),
        col("exact_users_7d"))
      .orderBy(col("day"))
  }

  /** Audience OVERLAP between event types via HLL register algebra —
    * the set-operation face of the house sketch (r11, completing
    * union/merge from `hll_incremental` and windowed merge from
    * `hll_sliding`): |A∩B| estimated by inclusion–exclusion
    * est(A) + est(B) − est(A∪B), where the UNION estimate costs no
    * new pass — registers max-merge, so a pair's union registers are
    * computable from per-type cells alone. Engine shape: distinct
    * (type, user) pairs pinned once; each row replicated to the
    * unordered type pairs containing its type via two equi-joins
    * against the broadcast pair list (the event-type domain is a
    * bounded categorical dimension, so the pair list is a design
    * constant); singles and unions estimated by the same chain —
    * state is |types + pairs| × ≤1024 integer cells. The oracle
    * replays singles AND unions in ONE hllChainSql over the stacked
    * (g, k) relation (estimates depend only on each group's distinct
    * key set, so the engine's separate jobs land on identical
    * registers) and applies the same integer inclusion–exclusion —
    * every APPROXIMATE value hash-compares. Exact companions ride
    * for the accuracy story (mean |Δ|/union loudly required ≤ 5%,
    * the hll_incremental contract form); at 100 TB you drop them.
    */
  def hllIntersect(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Hll
    val salt = 555000L
    val du = graft.ops.Dedup.materialize(
      t(s, dir, "events")
        .select(col("event_type").as("t"), col("user_id").as("u"))
        .distinct())
    // bounded collect: event_type is a categorical domain column
    // (5 values in this corpus) — the same bounded-dimension contract
    // as the dpp weight dim
    val types = du.select(col("t")).distinct().orderBy(col("t"))
      .collect().map(_.getString(0)).toSeq
    import s.implicits._
    val pairList = broadcast(
      (for { a <- types; b <- types if a < b } yield (a, b))
        .toDF("ta", "tb"))
    val pairRows =
      du.join(pairList, col("t") === col("ta"))
        .unionByName(du.join(pairList, col("t") === col("tb")))
        .select(concat(col("ta"), lit("|"), col("tb")).as("g"), col("u"))
    val singles = Hll.distinctCount(du, Seq("t"), col("u"), salt, "est")
    val unions = Hll.distinctCount(pairRows, Seq("g"), col("u"), salt,
      "approx_union")
    val exact = du.select(col("t").as("xa"), col("u"))
      .join(du.select(col("t").as("xb"), col("u")), Seq("u"))
      .filter(col("xa") < col("xb"))
      .groupBy(col("xa"), col("xb"))
      .agg(count(lit(1)).as("exact_intersect"))
    val out = graft.ops.Dedup.materialize(pairList
      .join(singles.select(col("t").as("ta"), col("est").as("approx_a")),
        Seq("ta"))
      .join(singles.select(col("t").as("tb"), col("est").as("approx_b")),
        Seq("tb"))
      .join(unions, concat(col("ta"), lit("|"), col("tb")) === col("g"))
      .join(exact,
        col("ta") === col("xa") && col("tb") === col("xb"), "left")
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("approx_a"), col("approx_b"), col("approx_union"),
        greatest(lit(0L),
          col("approx_a") + col("approx_b") - col("approx_union"))
          .as("approx_intersect"),
        coalesce(col("exact_intersect"), lit(0L)).as("exact_intersect"))
      .orderBy(col("type_a"), col("type_b")))
    val meanErr = out
      .agg(avg(abs(col("approx_intersect") - col("exact_intersect"))
        / col("approx_union"))).head().getDouble(0)
    require(meanErr <= 0.05,
      f"hll_intersect: mean |approx-exact|/union $meanErr%.4f " +
        "breaches the 5% accuracy contract")
    out
  }

  /** Time-range self-join: same-user event pairs within 6 hours —
    * banded equi-join ([[graft.ops.RangeJoin]]), no nested loop.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val sixHoursUs = 6L * 3600 * 1000000
    val ev = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id"))
    graft.ops.RangeJoin.selfPairsWithin(ev, Seq("user_id"), "ts_us",
        window = sixHoursUs, carryCols = Seq("event_id"))
      .select(col("user_id"), col("event_id_a"), col("event_id_b"),
        (col("ts_us_b") - col("ts_us_a")).as("gap_us"))
      .orderBy(col("user_id"), col("event_id_a"), col("event_id_b"))
  }

  /** Unpivot (melt): the per-user type-count matrix back to long form
    * — inverse of [[pivotEvents]], zero-shuffle over its input.
    */
  def unpivotEvents(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    pivotEvents(s, dir)
      .unpivot(Array(col("user_id")), types.map(col).toArray,
        "event_type", "n")
      .filter(col("n") > 0)
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Custom typed UDAF: SpaceSaving top-3 event types per user
    * (capacity 32 ≥ 5 distinct types ⇒ exact, hence oracle-checkable;
    * at true scale the capacity bound is what keeps per-group state
    * constant).
    */
  def topkFreq(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKFreq.topk_freq
    t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(topk_freq(col("event_type"), k = 3, capacity = 32).as("items"))
      .select(col("user_id"), posexplode(col("items")).as(Seq("pos", "it")))
      .select(col("user_id"), (col("pos") + 1).as("rnk"),
        col("it.item").as("etype"), col("it.cnt").as("cnt"))
      .orderBy(col("user_id"), col("rnk"))
  }

  /** Driver-visible accuracy gate for the SpaceSaving sketch in its
    * APPROXIMATE regime — capacity 8 < the 31-token corpus vocabulary,
    * so evictions and real overestimates occur (unlike [[topkFreq]],
    * which runs the sketch where it is exact). The summary CONTENTS
    * are partition-order-dependent (which is why no raw approximate
    * query is registered), but the SpaceSaving guarantees (Metwally
    * et al. ICDT'05; merge-safety per Agarwal et al., mergeable
    * summaries) hold for EVERY arrival order, so the gate row is
    * deterministic: counters sum exactly to the stream length N;
    * every estimate overestimates its true count by at most 2N/c; and
    * every token whose true count exceeds 2N/c is present. The bound
    * is 2N/c, not the single-stream N/c, because the merge re-streams
    * partial summaries (one N/c from the final fold's min counter,
    * one from the ≤ N/c error already inside re-streamed leaf
    * summaries — Spark's two-level partial/final aggregation keeps
    * the fold flat, so the factor stays 2 regardless of partition
    * count). Both compares are exact-integer ((est−true)·c ≤ 2N).
    */
  def topkFreqBound(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKFreq.topk_freq
    val cap = 8
    val toks = t(s, dir, "documents")
      .select(explode(graft.ops.Dedup.tokens(col("text"))).as("token"))
    val summary = toks
      .agg(topk_freq(col("token"), k = cap, capacity = cap).as("items"))
      .select(explode(col("items")).as("it"))
      .select(col("it.item").as("token"), col("it.cnt").as("est"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("tn"))
    val tot = exact.agg(coalesce(sum(col("tn")), lit(0L)).as("N"))
    val sagg = summary.join(exact, Seq("token"))
      .agg(count(lit(1)).as("n_counters"),
        coalesce(sum(col("est")), lit(0L)).as("sum_est"),
        coalesce(min(col("est") - col("tn")), lit(0L)).as("min_diff"),
        coalesce(max((col("est") - col("tn")) * cap), lit(0L))
          .as("max_scaled_err"))
    val missed = exact.crossJoin(broadcast(tot))
      .filter(col("tn") * cap > col("N") * 2)
      .join(summary.select(col("token")), Seq("token"), "left_anti")
      .agg(count(lit(1)).as("hh_missed"))
    sagg.crossJoin(broadcast(tot)).crossJoin(broadcast(missed))
      .select(col("n_counters"),
        when(col("sum_est") === col("N"), 1).otherwise(0).as("sum_eq_n"),
        when(col("min_diff") >= 0, 1).otherwise(0).as("all_overestimate"),
        when(col("max_scaled_err") <= col("N") * 2, 1).otherwise(0)
          .as("err_within"),
        when(col("hh_missed") === 0, 1).otherwise(0).as("hh_covered"))
  }

  /** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
    * over the document token stream, with the ESTIMATE surface itself
    * oracle-checked: d=4 rows × w=16 buckets (w deliberately far below
    * the corpus vocabulary so real collisions occur — 17 of the 31
    * vocab tokens carry genuine overestimates), row-hash family
    * g_r = mix64(h ⊕ mix64(seed+r)) obtained by feeding the 1-element
    * `token_hashes` array through `minhash_sig` (the existing codegen
    * kernels compose into the CMS hash family — no new expression),
    * bucket = (g ⋙ 32) mod w. The sketch build is ONE aggregation
    * whose output cardinality is d·w — constant, corpus-independent —
    * with map-side combine collapsing each partition to ≤ d·w partial
    * cells, so the shuffle carries d·w·partitions rows at ANY corpus
    * size; the estimate probe joins the broadcast d·w cell table.
    * Every arithmetic step is 64-bit integer, so DuckDB replays the
    * whole sketch (FNV-1a fold + two SplitMix64 chains in UBIGINT,
    * split lo/hi multiplies) and the estimates hash-match exactly —
    * the CMS guarantees (est ≥ true; est ≤ true + εN w.h.p.) are
    * visible in the `over_cnt` column rather than asserted by a gate.
    * True counts are computed for the report keys only (the bounded
    * vocab domain), not for the sketch itself.
    */
  def cmsFreq(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.dsl.{minhash_sig, token_hashes}
    val d = 4
    val w = 16
    val toks = t(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
      .filter(length(col("tok")) > 0)
    def buckets(df: DataFrame, carry: Seq[String]): DataFrame =
      df.select(carry.map(col) :+
          posexplode(minhash_sig(token_hashes(col("tok")), d))
            .as(Seq("r", "g")): _*)
        .select(carry.map(col) :+ col("r") :+
          (shiftrightunsigned(col("g"), 32) % w).cast("int").as("b"): _*)
    val cells = buckets(toks, Seq("tok"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cell_cnt"))
    val keys = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_cnt"))
    buckets(keys, Seq("tok", "true_cnt"))
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("tok"), col("true_cnt"))
      .agg(min(col("cell_cnt")).as("est"))
      .select(col("tok"), col("est"), col("true_cnt"),
        (col("est") - col("true_cnt")).as("over_cnt"))
      .orderBy(col("tok"))
  }

  /** JOIN-SIZE ESTIMATION from Count-Min inner products (Cormode &
    * Muthukrishnan §4.2 — the optimizer-statistics application next
    * to `cms_freq`'s point queries): |A ⋈_k B| = Σ_k cA(k)·cB(k) is
    * estimated as min over hash rows r of Σ_b cellsA(r,b)·cellsB(r,b)
    * — an OVERESTIMATE by construction (collisions only add), with
    * the two sketches built INDEPENDENTLY on each side, which is the
    * point: a planner can size a join from two 4×16-cell summaries
    * that were computed in separate scans (or shipped from separate
    * systems) without touching either table again. A/B here are the
    * event-id-parity halves of the event log joined on user_id — a
    * genuinely approximate regime (16 buckets ≪ distinct users, so
    * collision mass is live). Hash = the `shuffle_key` mix64 chain
    * over the long key directly (no string fold), salts 97+r; every
    * cell, both inner products, the row-min, and the true join size
    * replay in UBIGINT SQL. Cell products fit int64 while each
    * side ≤ ~3·10⁹ rows; past that the product column goes
    * DECIMAL(38,0) — the corpus_drift widening rule.
    */
  def cmsJoinEst(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.dsl.shuffle_key
    val d = 4
    val w = 16
    val e = t(s, dir, "events")
      .select(col("user_id"), (col("event_id") % 2 === 0).as("a"))
    val buckets = e.select(col("user_id"), col("a"),
      posexplode(array((0 until d).map(r =>
        (shiftrightunsigned(shuffle_key(col("user_id"), 97L + r), 32) % w)
          .cast("int")): _*)).as(Seq("r", "b")))
    // pinned: ≤ 2·d·w = 128 cells; both sketch legs read this table
    val cells = graft.ops.Dedup.materialize(
      buckets.groupBy(col("a"), col("r"), col("b"))
        .agg(count(lit(1)).as("c")))
    val est = cells.filter(col("a"))
      .select(col("r"), col("b"), col("c").as("ca"))
      .join(cells.filter(!col("a"))
        .select(col("r"), col("b"), col("c").as("cb")), Seq("r", "b"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_join"))
    val truth = e.groupBy(col("user_id"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ka"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("kb"))
      .agg(sum(col("ka") * col("kb")).as("true_join"),
        sum(col("ka")).as("n_a"), sum(col("kb")).as("n_b"))
    truth.crossJoin(broadcast(est))
      .select(col("n_a"), col("n_b"), col("true_join"), col("est_join"),
        (col("est_join") - col("true_join")).as("over_join"))
  }

  /** Market-basket association rules over (user, day) baskets of event
    * types: support / confidence / lift for every ordered pair, in
    * exact ×10⁶ integer arithmetic (div, not float — hash-stable).
    * Scale shape: one shuffle to baskets (groupBy user+day,
    * collect_set bounded by the item domain), pair fanout ≤ |set|² as
    * a scan-stage double explode — never a row-level self-join of the
    * event log — then counts over the tiny (item, item) domain.
    */
  def assocRules(s: SparkSession, dir: String): DataFrame = {
    // persisted: pairs, item counts, and the basket total all read
    // this frame — without the pin Spark rebuilds the basket shuffle
    // once per consumer (4 log scans instead of 1)
    val b = t(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(collect_set(col("event_type")).as("items"))
      .persist()
    val pairs = b
      .select(explode(col("items")).as("antecedent"), col("items"))
      .select(col("antecedent"), explode(col("items")).as("consequent"))
      .filter(col("antecedent") =!= col("consequent"))
      .groupBy("antecedent", "consequent").agg(count(lit(1)).as("n_both"))
    val singles = b.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val total = b.agg(count(lit(1)).as("n_baskets"))
    val out = pairs
      .join(broadcast(singles.select(col("item").as("antecedent"),
        col("n_item").as("n_ante"))), Seq("antecedent"))
      .join(broadcast(singles.select(col("item").as("consequent"),
        col("n_item").as("n_cons"))), Seq("consequent"))
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        // integral div (matches DuckDB //) — Column./ would go double
        expr("n_both * 1000000 div n_baskets").as("support_e6"),
        expr("n_both * 1000000 div n_ante").as("confidence_e6"),
        // exact-integer lift; the triple product needs decimal(38) if
        // basket counts approach 2^31 — at that point lift is a
        // display metric and a double is the right trade
        expr("n_both * n_baskets * 1000000 div (n_ante * n_cons)")
          .as("lift_e6"))
    // materialize-then-unpersist: rule table is |items|²-bounded; the
    // basket cache must not accumulate across suite runs
    val pinned = graft.ops.Dedup.materialize(out)
    b.unpersist()
    pinned.orderBy(col("antecedent"), col("consequent"))
  }

  /** Weekly retention cohorts: users bucketed by first-seen week, the
    * classic (cohort, week-offset) → distinct-active triangle. Two
    * shuffles on user_id (first-week agg + the distinct), then an
    * aggregate over the tiny (cohort, offset) domain; the broadcast
    * joins the per-user cohort dimension back in.
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort"))
    ev.distinct()
      .join(cohort, Seq("user_id"))
      .groupBy(unix_micros(col("cohort").cast("timestamp")).as("cohort_us"),
        expr("cast(datediff(to_date(wk), to_date(cohort)) as bigint) div 7")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_us"), col("week_offset"))
  }

  /** Strict ordered funnel signup → click → purchase: each stage's
    * timestamp is the earliest event of that type STRICTLY after the
    * previous stage (per user). Three conditional min-aggregates, each
    * a compact shuffle on user_id over rows already filtered to one
    * event type; NULL propagates naturally (no prior stage ⇒ no
    * comparison ⇒ stage NULL). Output is per-user with the reached
    * stage count — the driver hashes every timestamp, not just the
    * funnel totals.
    */
  def funnelOrdered(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts").cast("timestamp")).as("tsu"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("tsu")).as("t_signup"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("tsu") > col("t_signup"))
      .groupBy("user_id").agg(min(col("tsu")).as("t_click"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("tsu") > col("t_click"))
      .groupBy("user_id").agg(min(col("tsu")).as("t_purchase"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_signup"), col("t_click"),
        col("t_purchase"),
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0))
          .as("stages_reached"))
      .orderBy(col("user_id"))
  }

  /** Statistical anomaly detection: events whose value is more than
    * 3σ from their type's mean — the z-score outlier monitor that
    * complements the rule-based [[dqExpectations]] (which checks
    * DECLARED constraints; this finds the undeclared surprises).
    * Scale shape: the per-type moment dimension is tiny and broadcast
    * back over one scan — two passes over the log, no wide shuffle.
    * z is emitted rounded to 4 dp (double summation order differs
    * across engines; the stats_agg precedent), and the 3σ row-set
    * boundary is safe because sample z-scores sit ulps — not 1e-4s —
    * from the oracle's.
    */
  def anomalyEvents(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = ev.groupBy("event_type")
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))
    ev.join(broadcast(stats), Seq("event_type"))
      .filter(col("sigma") > 0 &&
        abs(col("value") - col("mu")) > col("sigma") * 3)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 4).as("value_r"),
        round((col("value") - col("mu")) / col("sigma"), 4).as("z_r"))
      .orderBy(col("event_id"))
  }

  /** SCD Type-2 history over the event change log: each user's events
    * become versioned validity intervals (version, valid_from/to,
    * is_current) — the warehouse-load shape a history-keeping CRM sync
    * needs. One shuffle on user_id serves numbering, interval close,
    * and the current flag (see [[graft.ops.Scd.type2]]).
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame =
    Scd.type2(t(s, dir, "events"),
        keyCols = Seq("user_id"), orderCol = "ts", tieCol = "event_id",
        attrCols = Seq("event_type", "value"))
      .select(col("user_id"), col("version"), col("event_type"), col("value"),
        unix_micros(col("valid_from").cast("timestamp")).as("valid_from_us"),
        unix_micros(col("valid_to").cast("timestamp")).as("valid_to_us"),
        col("is_current"))
      .orderBy(col("user_id"), col("version"))

  /** SCD2 AS-OF lookup — the query the Type-2 history EXISTS for
    * (point-in-time dimension enrichment: "what was this user's state
    * as of date D?"): every 20th user probed at three fixed dates
    * (first-day + 5/15/25), each probe joined to its covering
    * validity interval (valid_from ≤ p < valid_to, open current
    * version included). The dim is PINNED — in production the SCD2
    * dim IS a stored warehouse table, so the pin stands in for the
    * table the intervals were loaded to, and the probe spine derives
    * from the pinned dim (distinct keys + min day), not fresh corpus
    * scans (the round-9 multi-scan convention). Plan: equi-join on
    * user_id carries the locality; the interval predicate evaluates
    * against each user's own version list — never a cartesian. The
    * oracle replays the window-numbered intervals and the same three
    * probe timestamps.
    */
  def scd2Asof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = graft.ops.Dedup.materialize(
      Scd.type2(t(s, dir, "events"),
          keyCols = Seq("user_id"), orderCol = "ts", tieCol = "event_id",
          attrCols = Seq("event_type", "value"))
        .select(col("user_id"), col("version"), col("event_type"),
          unix_micros(col("valid_from").cast("timestamp")).as("f"),
          unix_micros(col("valid_to").cast("timestamp")).as("t")))
    val d0 = dim
      .agg(min(to_date(timestamp_micros(col("f")))).as("d0"))
    val probes = dim.select(col("user_id")).distinct()
      .filter(pmod(col("user_id"), lit(20)) === 0)
      .crossJoin(broadcast(d0))
      .crossJoin(Seq(5, 15, 25).toDF("o"))
      .select(col("user_id"),
        unix_micros(date_add(col("d0"), col("o")).cast("timestamp"))
          .as("probe_us"))
    probes.join(dim.withColumnRenamed("user_id", "du"),
        col("user_id") === col("du") && col("f") <= col("probe_us") &&
          (col("t").isNull || col("probe_us") < col("t")))
      .select(col("user_id"), col("probe_us"), col("version"),
        col("event_type"))
      .orderBy(col("user_id"), col("probe_us"))
  }

  /** SKEW-HARDENED SCD2 — [[graft.ops.Scd.type2Salted]] driven on a
    * genuinely hot business key: `event_type` has only 5 values, so
    * the plain [[graft.ops.Scd.type2]] window would pool 20% of the
    * corpus in ONE task (the hazard type2's scaladoc documents and
    * previously punted upstream). The salted variant buckets each key
    * by the change's epoch-week (order-aligned, a pure function of
    * ts), numbers versions inside (key, week), and stitches with a
    * broadcast |keys × weeks| offset table — the hot key spreads over
    * |weeks| tasks. The oracle is the PLAIN GLOBAL-WINDOW replay, so
    * hash equality proves salting is indistinguishable from the
    * single-task window; PlanSpec pins the corpus-side Window to
    * partition on (event_type, __bucket), never the key alone.
    */
  def scd2Salted(s: SparkSession, dir: String): DataFrame = {
    val week = expr("datediff(to_date(ts), DATE'1970-01-01') div 7")
    Scd.type2Salted(t(s, dir, "events"),
        keyCols = Seq("event_type"), orderCol = "ts", tieCol = "event_id",
        attrCols = Seq("value"), bucket = week)
      .select(col("event_type"), col("version"), col("event_id"),
        col("value"),
        unix_micros(col("valid_from").cast("timestamp")).as("valid_from_us"),
        unix_micros(col("valid_to").cast("timestamp")).as("valid_to_us"),
        col("is_current"))
      .orderBy(col("event_type"), col("version"))
  }

  /** Exact-integer PageRank (3 iterations, damping 85/100, e12
    * fixed-point) over the symmetrized customer–supplier order graph:
    * edge (c, S) when customer c ordered from supplier S; supplier
    * node ids offset by 2⁴⁰ so the key spaces stay disjoint up to
    * ~10¹² customers (TPC-H custkeys reach 1.5M·SF — a 10⁶ offset
    * would collide past SF≈7 and break the disjointness argument
    * `assumeDistinct` relies on). Top-100
    * nodes by rank. See [[graft.ops.Graph.pageRankE12]] for why the
    * arithmetic is integral (hash-matchable across engines and
    * partition counts).
    */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    // dedup the DIRECTED half (|E| rows) rather than the symmetrized
    // set (2|E|): customer and supplier ids live in disjoint ranges,
    // so a forward edge can never equal a reversed one and the union
    // of a distinct set with its reverse is distinct by construction
    val edges = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1L << 40) + col("l_suppkey")).as("dst"))
      .distinct()
    Graph.pageRankE12(Graph.symmetrize(edges), iters = 3,
        assumeDistinct = true)
      .orderBy(col("rank_e12").desc, col("id")).limit(100)
  }

  /** HITS hubs & authorities ([[graft.ops.Graph.hitsE6]], 2
    * iterations) over the DIRECTED customer→supplier order graph —
    * the bipartite companion to `pagerank`'s symmetric walk: hubs
    * (customers) score by the authority of the suppliers they buy
    * from, authorities (suppliers) by the hub-ness of their buyers.
    * All-integer max-norm iterations, so the full score table
    * hash-compares against the oracle's unrolled two-round replay.
    */
  def hitsRank(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1L << 40) + col("l_suppkey")).as("dst"))
    Graph.hitsE6(edges, iters = 2)
      .orderBy(col("side"), col("id"))
  }

  /** k-core (k=8) of the same symmetrized customer–supplier order
    * graph `pagerank` walks: iterated peeling to the unique maximal
    * min-degree-≥ 8 subgraph (see [[graft.ops.Graph.kCore]] — throws
    * rather than converging silently short). Output is every core
    * node with its in-core degree. The oracle unrolls 5 peel rounds
    * in SQL (each round: drop edges touching a sub-k endpoint, via
    * two degree windows); peeling is idempotent at the fixpoint, so
    * the unroll is exact as long as 5 ≥ the true depth — this graph
    * converges in 2 (verified 0.001/0.01/0.1).
    */
  def kcore(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1L << 40) + col("l_suppkey")).as("dst"))
      .distinct()
    graft.ops.Graph.kCore(graft.ops.Graph.symmetrize(edges), k = 8)
      .orderBy(col("id"))
  }

  /** Multi-source BFS over the customer–supplier order graph: minimum
    * hop count (≤ 3) from the seed set {customers with
    * custkey % 199 = 0} — the "blast radius" query of provenance /
    * contamination tracing (which suppliers are one hop from a flagged
    * customer, which customers share those suppliers, ...). Frontier
    * expansion, one equi-join per hop against the CURRENT frontier —
    * never the visited set — so per-round work tracks the frontier's
    * edge incidence, not |E| (see [[graft.ops.Graph.bfsHops]]). The
    * oracle unrolls the 3 hops as joins + set differences — exact, no
    * recursive CTE (whose DuckDB evaluation at sf0.1 is the known
    * oracle-budget trap).
    */
  def bfsHopsQ(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1L << 40) + col("l_suppkey")).as("dst"))
      .distinct()
    val seeds = edges.filter(col("src") % 199 === 0)
      .select(col("src").cast("long").as("id"))
    Graph.bfsHops(Graph.symmetrize(edges), seeds, maxHops = 3)
      .orderBy(col("id"))
  }

  // guards the write-once bucketed-table setup below
  private val bktLock = new Object
  // versioned-dir → unique table-name suffix: a per-JVM counter, never
  // a 32-bit string hash (two dirs colliding in hashCode would silently
  // serve one dir's bucketed tables to the other's query)
  private val bktSuffix =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val bktCounter = new java.util.concurrent.atomic.AtomicInteger

  /** STORAGE-co-located join driven end-to-end: orders and customer
    * are written once per (session, dir) as 8-bucket catalog tables
    * on the join key ([[graft.ops.Sink.bucketedSave]] — bucketBy +
    * sortBy + saveAsTable into a temp-location database), then joined
    * under a merge hint: both sides' outputPartitioning already
    * satisfies the join distribution, so the SortMergeJoin runs with
    * ZERO pre-join Exchange (PlanSpec pins it on this query's plan).
    * This is the layout answer for a 100 TB fact table joined daily
    * on one key — the shuffle is paid ONCE at write time; every
    * subsequent join rides the bucket files. SinkSpec covers the
    * mechanism; this row makes it driver-visible with a full oracle
    * over the raw (unbucketed) tables — bucketing must be
    * result-invariant.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val db = "graft_bkt"
    val ver = bktSuffix.computeIfAbsent(graft.Tables.versioned(dir),
      _ => s"v${bktCounter.getAndIncrement()}")
    val ot = s"$db.orders_b_$ver"
    val ct = s"$db.customer_b_$ver"
    bktLock.synchronized {
      if (!s.catalog.databaseExists(db))
        s.sql(s"CREATE DATABASE $db LOCATION '" +
          java.nio.file.Files.createTempDirectory("graft_bkt") + "'")
      if (!s.catalog.tableExists(ot))
        graft.ops.Sink.bucketedSave(
          t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")), ot, "o_custkey", 8)
      if (!s.catalog.tableExists(ct))
        graft.ops.Sink.bucketedSave(
          t(s, dir, "customer").select(col("c_custkey"),
            col("c_nationkey")), ct, "c_custkey", 8)
    }
    val o = s.table(ot).select(col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val c = s.table(ct)
    o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .orderBy(col("c_nationkey"))
  }

  /** Bounded-hop WEIGHTED shortest paths — the weighted completion of
    * `bfs_hops` ([[graft.ops.Graph.ssspBoundedHops]], 3 distributed
    * Bellman–Ford relaxation rounds): over the same customer–supplier
    * order graph with edge weight = the number of lineitems linking
    * the pair (a transfer-cost proxy, exact int64), from the same
    * seed set (custkey % 199 = 0), dist(v) = the exact minimum total
    * weight over ≤3-edge paths. Each round is one equi-join on src +
    * one min-aggregate (map-side combinable, order-independent), so
    * the trajectory is partitioning-independent and the oracle
    * unrolls the 3 rounds as join + UNION ALL + min CTEs — no
    * recursive CTE.
    */
  def ssspWeighted(s: SparkSession, dir: String): DataFrame = {
    val ge = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("src"),
        (lit(1L << 40) + col("l_suppkey")).as("dst"))
      .agg(count(lit(1)).as("w"))
    val edges = ge.unionAll(
      ge.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val seeds = ge.filter(col("src") % 199 === 0)
      .select(col("src").cast("long").as("id"))
    Graph.ssspBoundedHops(edges, seeds, rounds = 3)
      .orderBy(col("id"))
  }

  /** Deterministic label propagation (3 synchronous rounds, min-label
    * tie-break — [[graft.ops.Graph.labelPropagation]]) over the same
    * customer–supplier order graph as `pagerank`/`kcore`/`bfs_hops`:
    * the community-detection member of the graph family. The oracle
    * unrolls the 3 rounds in SQL (join + count + row_number argmax
    * per round — the bfs_hops unroll pattern applied to label
    * frequencies), so the full label trajectory is hash-checked, not
    * just gated.
    */
  /** The customer–supplier co-purchase pair set shared by the graph
    * queries (directed, unique; dst offset keeps the sides disjoint).
    */
  private def graphPairs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (lit(1L << 40) + col("l_suppkey")).as("dst"))
      .distinct()

  /** Detect-once memo: `label_prop` and `modularity` consume the SAME
    * 3-round LPA labels for a corpus dir — in a real pipeline the
    * scorer reads the detector's output table, it does not re-run the
    * detector. The labels are localCheckpoint-pinned, and LPA is
    * deterministic (min-label tie-break), so a cached table is
    * byte-identical to a recompute; keyed by (session identity, dir)
    * via [[graft.SessionMemo]] because a checkpointed frame is
    * session-bound. The dir part of the key assumes fixed data for the
    * JVM's lifetime (true for the driver's immutable test corpora).
    */
  private def lpaLabels(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.getOrCompute(s, s"lpa:${graft.Tables.versioned(dir)}",
      graft.ops.Dedup.materialize(
        Graph.labelPropagation(Graph.symmetrize(graphPairs(s, dir)),
          rounds = 3)))

  def labelProp(s: SparkSession, dir: String): DataFrame =
    lpaLabels(s, dir).orderBy(col("id"))

  /** Newman modularity of the label-propagation partition — closes
    * the graph loop: `label_prop` finds communities, this SCORES the
    * partition (Q = Σ_c [e_c/m − (d_c/2m)²], the standard quality
    * function). Exactness: no division ever happens — the query
    * emits Q's numerator (4m·Σe_c − Σd_c², can be negative) and
    * denominator (4m²) as exact int64, sidestepping the trunc-vs-
    * floor integer-division divergence between engines entirely.
    * Plan: the pair set is computed once; communities come from the
    * same 3-round deterministic LPA as `label_prop`; e_c is one
    * equi-join of pair endpoints to labels, d_c one union-explode
    * degree count — everything keyed, nothing quadratic.
    *
    * On THIS graph the score is exactly −1/2: the customer–supplier
    * graph is bipartite, synchronous LPA settles on a two-side
    * split with ZERO intra-community edges, and Q = −Σ(d_c/2m)²
    * degenerates to its bipartite floor. That is the point of
    * shipping the scorer next to the detector — it measures (and
    * the oracle hash-pins) that LPA's partition here is worse than
    * random, the documented failure mode of sync-LPA on bipartite
    * graphs (Raghavan et al. §5).
    */
  def modularity(s: SparkSession, dir: String): DataFrame = {
    val pairs = graphPairs(s, dir).persist()
    val labels = lpaLabels(s, dir)
    val withLab = pairs
      .join(labels.select(col("id").as("src"), col("lab").as("lab_s")),
        Seq("src"))
      .join(labels.select(col("id").as("dst"), col("lab").as("lab_d")),
        Seq("dst"))
    val eC = withLab.filter(col("lab_s") === col("lab_d"))
      .groupBy(col("lab_s").as("lab")).agg(count(lit(1)).as("e_c"))
    val deg = pairs.select(col("src").as("id"))
      .unionAll(pairs.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val dC = deg.join(labels, Seq("id"))
      .groupBy(col("lab")).agg(sum(col("d")).as("d_c"))
    val m = pairs.agg(count(lit(1)).as("m"))
    val out = dC.join(eC, Seq("lab"), "left")
      .agg(sum(coalesce(col("e_c"), lit(0L))).as("sum_ec"),
        sum(expr("d_c * d_c")).as("sum_dc2"),
        count(lit(1)).as("n_communities"))
      .crossJoin(broadcast(m))
      .select(col("m").as("m_edges"), col("n_communities"),
        expr("4 * m * sum_ec - sum_dc2").as("q_num"),
        expr("4 * m * m").as("q_den"))
    // materialize-then-unpersist: the score is one row; the edge cache
    // must not outlive it in a long-lived session
    val pinned = graft.ops.Dedup.materialize(out)
    pairs.unpersist()
    pinned
  }

  /** Bloom-prune gate: lineitem pruned by a Bloom filter of the
    * high-balance suppliers' keys must (a) keep every true match — no
    * false negatives, the filter's contract, (b) actually prune, and
    * (c) keep false positives under 10% of the non-matching rows
    * (the sketch targets ~3%; data and seed are fixed, so the measured
    * value is deterministic). n_total / n_exact are SQL-recomputable;
    * the three assertions ride as pinned flags — same driver-visible
    * gate pattern as `kmeans_gate` (the bitmap itself is not
    * SQL-expressible).
    */
  /** HOUSE Bloom filter — the cross-engine-replayable companion to
    * [[bloomPrune]] (Spark's `BloomFilter` bitmap is impl-specific,
    * so that row is gate-form; here every membership DECISION,
    * including each false positive, hash-checks). m = 128 bits,
    * k = 3 hashes: bit_i = shuffle_key(key, 5000+i) & (m−1) — m is
    * DELIBERATELY small so the filter runs in the genuinely
    * approximate regime at the test SFs (the cms_freq discipline:
    * real false positives exist and their exact identities
    * hash-compare; a production filter sizes m ≈ 10·n for ~1% FP,
    * same plan). The build side (every-7th supplier) collapses to a
    * 2-long word bitmap collected driver-side (bounded by m/64 BY
    * DESIGN) and inlined as a plan literal, so the probe is pure
    * scan-stage bit arithmetic — the real Bloom deployment shape: a
    * tiny bitmap broadcast into the scan, no join for the filter
    * itself. Emitted: every distinct probed suppkey that PASSES,
    * flagged true member (1) or false positive (0); the oracle
    * rebuilds the position set from the build keys with the same
    * three mix64 chains and replays the all-k-bits-present rule.
    */
  def bloomHouse(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.dsl.shuffle_key
    val build = t(s, dir, "supplier")
      .filter(pmod(col("s_suppkey"), lit(7)) === 0)
      .select(col("s_suppkey").as("k"))
    def positions(key: Column): Column = array(
      shuffle_key(key, 5001L).bitwiseAND(lit(127L)),
      shuffle_key(key, 5002L).bitwiseAND(lit(127L)),
      shuffle_key(key, 5003L).bitwiseAND(lit(127L)))
    val words = new Array[Long](2)
    build.select(explode(positions(col("k"))).as("p")).distinct()
      .collect().foreach { r =>
        val p = r.getLong(0)
        words((p >> 6).toInt) |= (1L << (p & 63).toInt)
      }
    val probe = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("k")).distinct()
      .withColumn("words", typedLit(words.toSeq))
      .withColumn("ps", positions(col("k")))
      // (word >> s) & 1 extracts bit s for s in 0..63 regardless of
      // shift signedness — only the low bit survives the mask
      .withColumn("hits", expr(
        "aggregate(ps, 0, (acc, p) -> acc + CAST((element_at(words, " +
          "CAST(p DIV 64 AS INT) + 1) >> CAST(p % 64 AS INT)) & 1 " +
          "AS INT))"))
    probe.filter(col("hits") === 3)
      .join(broadcast(build.withColumn("m", lit(1))), Seq("k"), "left")
      .select(col("k").as("l_suppkey"),
        coalesce(col("m"), lit(0)).cast("int").as("is_member"))
      .orderBy(col("l_suppkey"))
  }

  def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val keys = t(s, dir, "supplier")
      .filter(col("s_acctbal") >= 9000).select(col("s_suppkey"))
    val nTotal = li.count()
    val nExact = li.join(keys, li("l_suppkey") === keys("s_suppkey"),
      "left_semi").count()
    val pruned = graft.ops.BloomPrune.bloomSemiFilter(
      li, col("l_suppkey"), keys, col("s_suppkey"), expectedItems = 100000)
    val nPruned = pruned.count()
    val nExactInPruned = pruned.join(keys,
      pruned("l_suppkey") === keys("s_suppkey"), "left_semi").count()
    val noFn = if (nExactInPruned == nExact) 1 else 0
    val selective = if (nPruned < nTotal) 1 else 0
    val fpBounded = if (10 * (nPruned - nExact) <= nTotal - nExact) 1 else 0
    Seq((nTotal, nExact, noFn, selective, fpBounded))
      .toDF("n_total", "n_exact", "no_false_negatives",
        "pruned_selective", "fp_bounded")
  }

  /** Edit-distance-1 fuzzy self-join over customer names (FastSS
    * deletion-neighborhood equi-join + exact levenshtein verify — see
    * [[graft.ops.FuzzyJoin.editDistance1Pairs]]). Serial-numbered
    * names make this a real workout: every single-digit substitution
    * neighbor must surface.
    */
  def fuzzyJoin(s: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin.editDistance1Pairs(
        t(s, dir, "customer"), "c_custkey", "c_name")
      .orderBy(col("id_a"), col("id_b"))

  /** END-TO-END entity resolution — the record-linkage pipeline
    * composed from certified parts, the `training_pipeline` discipline
    * applied to MDM: (1) blocking + candidate pairs via the FastSS
    * deletion-neighborhood edit-distance-1 join (`fuzzy_join`'s
    * operator — never an all-pairs string comparison), (2) entity
    * formation by connected components over the match pairs (min-key
    * roots), (3) survivorship/consolidation per entity: the lowest
    * key's name is canonical, balances merge as exact per-row cents
    * (round → int64 → sum, the q14 rule), membership counted.
    * Singleton customers are entities too (left-anti absence from the
    * labels ⇒ self-entity — the `dedup_canonical` rule). One pair
    * join + one CC pass + two hash aggregates; nothing rescans the
    * customer table per entity.
    */
  def entityResolution(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    // match rule = name edit-distance ≤ 1 AND same nation. The nation
    // agreement is not decoration: sequential TPC-H names are an
    // edit-1 CHAIN (…001 ↔ …002 ↔ …), and transitive closure over the
    // name signal alone snowballs the whole table into ONE entity —
    // the classic ER failure mode that blocking attributes exist to
    // break. (Measured: 1 entity without the rule, per-nation chain
    // fragments with it.)
    val nat = cust.select(col("c_custkey"), col("c_nationkey"))
    val pairs = graft.ops.FuzzyJoin.editDistance1Pairs(
        cust, "c_custkey", "c_name")
      .select(col("id_a"), col("id_b"))
      .join(nat.select(col("c_custkey").as("id_a"),
        col("c_nationkey").as("nk_a")), Seq("id_a"))
      .join(nat.select(col("c_custkey").as("id_b"),
        col("c_nationkey").as("nk_b")), Seq("id_b"))
      .filter(col("nk_a") === col("nk_b"))
      .select(col("id_a"), col("id_b"))
    val labels = graft.ops.Dedup.connectedComponents(pairs)
    val full = cust
      .join(labels.withColumnRenamed("id", "c_custkey"),
        Seq("c_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("cluster_id"), col("c_custkey")).as("entity_id"),
        round(col("c_acctbal") * 100).cast("long").as("cents"))
    val g = full.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("cents")).as("acctbal_cents"))
    g.join(cust.select(col("c_custkey").as("entity_id"),
        col("c_name").as("canonical_name")), Seq("entity_id"))
      .select(col("entity_id"), col("n_members"),
        col("canonical_name"), col("acctbal_cents"))
      .orderBy(col("entity_id"))
  }

  /** Daily gap-fill over each user's `value` series: complete daily
    * grid from first to last event day, carrying the day's last
    * observation forward across gaps (see
    * [[graft.ops.GapFill.dailyForwardFill]] — one shuffle on user_id
    * serves resample, grid, and fill).
    */
  def gapFill(s: SparkSession, dir: String): DataFrame =
    graft.ops.GapFill.dailyForwardFill(t(s, dir, "events"),
        keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
        valueCol = "value")
      .orderBy(col("user_id"), col("day_us"))

  /** Warehouse-load round-trip gate: lineitem written through the
    * sink (overwrite load), read back, and compared by the
    * order-independent table digest ([[graft.ops.Sink.tableChecksum]])
    * — the replication validation the reference's sync lifecycle
    * implies but never performs. n_rows is SQL-recomputed; equality
    * flags pinned. Makes the K1 sink driver-visible instead of
    * unit-only.
    */
  def syncChecksum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val (nSrc, ckSrc) = graft.ops.Sink.tableChecksum(li)
    val out = java.nio.file.Files
      .createTempDirectory("graft_sync_gate").toString
    graft.ops.Sink.overwriteLoad(li, s"$out/lineitem")
    val back = s.read.parquet(s"$out/lineitem")
    val (nBack, ckBack) = graft.ops.Sink.tableChecksum(back)
    // both digests are computed by now; the result below is a local
    // relation, so the round-trip files can go
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    Seq((nSrc,
        if (nBack == nSrc) 1 else 0,
        if (ckBack.compareTo(ckSrc) == 0) 1 else 0,
        if (ckSrc.signum != 0) 1 else 0))
      .toDF("n_rows", "rows_preserved", "checksum_equal", "digest_nonzero")
  }

  /** Grid-bucketed SPATIAL radius self-join — the banding pattern
    * applied to 2-D space (the cell trick every spatial engine uses:
    * bucket by ⌊coord/D⌋, probe the 3×3 neighborhood, verify exact):
    * customers get deterministic integer coordinates on a
    * 100k×100k grid (SplitMix64 of the key — the synthesize→parse
    * tradition, replayable), and the query returns every pair within
    * Euclidean distance D = 1200 with its EXACT integer distance².
    * Candidate generation is an EQUI-join on cell ids (one side
    * explodes its 9 neighbor cells), so the work is
    * O(n · density·9) — never the n²/2 all-pairs — and the verify
    * filter is pure integer arithmetic. The same shape serves
    * geo dedup, store-proximity joins, and collision checks at
    * 100 TB: cell size tracks the radius, AQE handles hot cells (or
    * the dedup_salted escalation applies verbatim).
    */
  private val SpatialD = 1200L

  /** The synthesized grid points + cell ids the spatial queries
    * share.
    */
  private def spatialPoints(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.dsl.shuffle_key
    t(s, dir, "customer").select(col("c_custkey").as("id"),
        pmod(shuffle_key(col("c_custkey"), 1L), lit(100000L)).as("x"),
        pmod(shuffle_key(col("c_custkey"), 2L), lit(100000L)).as("y"))
      .withColumn("cx", expr(s"x DIV $SpatialD"))
      .withColumn("cy", expr(s"y DIV $SpatialD"))
  }

  def spatialJoin(s: SparkSession, dir: String): DataFrame =
    graft.ops.Spatial.radiusPairs(spatialPoints(s, dir), SpatialD)
      .orderBy(col("id_a"), col("id_b"))

  /** Bounded-radius k-nearest-neighbors (k = 3 within D) for the
    * query subset — the point-lookup form of [[spatialJoin]]: the
    * SAME cell decomposition generates candidates (complete for
    * radius D, so the ranked result is EXACT, not approximate), only
    * the probe side shrinks to the queries. The standard
    * "nearest stores / nearest duplicates within tolerance" serving
    * shape; per query the work is its 9 cells' density, independent
    * of corpus size.
    */
  def spatialKnn(s: SparkSession, dir: String): DataFrame =
    graft.ops.Spatial.knnWithinRadius(spatialPoints(s, dir),
        queryPred = pmod(col("id"), lit(20)) === 0, d = SpatialD, k = 3)
      .orderBy(col("qid"), col("rnk"))

  /** Per-PARTITION sync manifest — the reconciliation artifact an
    * incremental warehouse sync keeps per day-partition: row count,
    * id bounds, and an ORDER-INVARIANT content digest (the sum of
    * per-row `shuffle_key` values — integer addition commutes, so the
    * digest is partition-layout- and arrival-order-independent, and
    * comparing manifests pinpoints WHICH day diverged where
    * `sync_checksum`'s single global digest only says THAT something
    * did). Fully oracle-replayed: the digest's SplitMix64 chain runs
    * bit-for-bit in UBIGINT SQL (the reservoir_sample precedent), so
    * this is the one checksum surface whose VALUE the driver gate
    * checks, not just its stability. One scan + one day-grouped
    * aggregate; the digest is the per-day sum WRAPPED mod 2⁶⁴ and
    * reinterpreted signed — a plain BIGINT cell (house rule: emitted
    * numeric cells stay within int64 — the r8 decimal(38,0) form was
    * value-correct but un-hashable by the driver gate). Wrap-around
    * addition still commutes, so order/partition invariance holds.
    */
  def partitionManifest(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.dsl.shuffle_key
    t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("event_id"),
        shuffle_key(col("event_id"), 424242L).as("h"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        graft.ops.Manifest.wrapSigned64(
          sum(col("h").cast("decimal(38,0)"))).as("digest"))
      .orderBy(col("day"))
  }

  /** Spatial CLUSTERS — the composition the spatial join exists for
    * (venue/location dedup): the within-D graph over a customer
    * subset (id % 10 = 0; the thinning keeps the disk graph
    * subcritical at every SF, so components stay local instead of
    * percolating into one giant blob) run through the SAME
    * large-star/small-star connected components the text dedup
    * pipeline uses ([[graft.ops.Dedup.connectedComponents]] — min-id
    * labels), with edge-less points as their own singleton clusters.
    * The oracle recomputes components INDEPENDENTLY: a recursive
    * transitive-closure CTE over the all-pairs edge set, min
    * reachable id per node.
    */
  def spatialClusters(s: SparkSession, dir: String): DataFrame = {
    val sub = spatialPoints(s, dir).filter(pmod(col("id"), lit(10)) === 0)
    val pairs = graft.ops.Spatial.radiusPairs(sub, 2000L)
      .select(col("id_a"), col("id_b"))
    val labels = graft.ops.Dedup.connectedComponents(pairs)
    val singles = sub.select(col("id"))
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster_id"))
    labels.unionByName(singles).orderBy(col("id"))
  }

  /** The THIRTEENTH driver-visible stream shape — the sync MANIFEST
    * maintained from the stream: events replayed as ≥2 real
    * micro-batches, each batch reduced to its per-day
    * (count, min, max, digest-sum) cells inside `foreachBatch` and
    * PERSISTED to a [[graft.ops.Manifest]] cell store keyed by batch
    * id — idempotent on checkpoint replay (same batch id overwrites
    * the same directory) and durable across incarnation rebuilds
    * (the running manifest is a merge over the tiny cell store, not
    * driver memory, so a restart loses nothing; proven by
    * StreamingSpec's manifest incarnation-rebuild test). The final
    * manifest must equal the batch recompute — it SHARES
    * `partition_manifest`'s oracle verbatim (the stream_ema
    * shared-oracle discipline), so the cross-batch merge of every
    * cell including the value-checked wrapped digest is
    * hash-verified. This is how an ingest keeps its reconciliation
    * artifact current without re-scanning history.
    */
  def streamManifest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val store = java.nio.file.Files
      .createTempDirectory("graft_manifest").toString
    val stream = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val persistBatch: (DataFrame, Long) => Unit = (batch, id) => {
      val cells = graft.ops.Manifest.dayCells(batch,
        to_date(Tables.eventTimeOf(schema, "ts")), col("event_id"),
        salt = 424242L).persist()
      try {
        if (cells.count() > 0) batches.incrementAndGet()
        graft.ops.Manifest.writeBatchCells(cells, store, id)
      } finally cells.unpersist()
    }
    val q = stream.writeStream.foreachBatch(persistBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    require(batches.get() >= 2,
      s"stream_manifest expected >=2 non-empty micro-batches, got " +
        batches.get())
    // pin the merged manifest BEFORE deleting the temp cell store: the
    // un-pinned frame would lazily re-read the store at the caller's
    // action, silently depending on the directory surviving — and an
    // undeleted store leaks disk per run
    val out = graft.ops.Dedup.materialize(
      graft.ops.Manifest.current(s, store).orderBy(col("day")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    out
  }

  /** Manifest DIFF — the reconciliation DECISION the manifest exists
    * for: compare the events manifest against a deterministically
    * PERTURBED replica (the warehouse copy after a bad sync) and
    * classify every day: `missing` (day d₀+3 absent from the
    * replica), `count_drift` (day d₀+10 lost its min-id row — counts
    * and bounds catch it), `content_drift` (day d₀+17 had one
    * INTERIOR id substituted, id → id+1 — count, min and max are all
    * UNCHANGED, so the order-invariant digest is the ONLY cell that
    * catches it; this row is why the digest earns its place), and
    * `match` everywhere else. Composition: feed the non-match days to
    * `interval_union` to get the minimal re-pull windows. Plan: both
    * sides reduce to |days| manifest cells before the single
    * full-outer join — the corpus is scanned once per side, the join
    * carries ~30 rows; perturbation anchors (first day, drop id,
    * substitute id) ride as broadcast 1-row aggregates. The oracle
    * replays BOTH sides' digest chains and the same perturbation
    * arithmetic.
    */
  def manifestDiff(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Manifest
    val ev = t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("event_id"))
    // A-side cells PINNED: the |days|-wide table then serves (a) the
    // A side of the diff and (b) the perturbation anchors d0 /
    // drop_x / m0 as tiny derived aggregates — the first draft
    // re-scanned the corpus per anchor (6 scans total); this shape
    // scans it 3 times (A cells, sub_x below, B cells), the floor
    // without checkpointing raw corpus rows.
    val cellsA = graft.ops.Dedup.materialize(
      Manifest.dayCells(ev, col("day"), col("event_id"), salt = 424242L))
    val d0 = cellsA.agg(min(col("day")).as("d0"))
    val dropId = cellsA.crossJoin(broadcast(d0))
      .filter(col("day") === date_add(col("d0"), 10))
      .agg(min(col("mn")).as("drop_x"))
    val minSub = cellsA.crossJoin(broadcast(d0))
      .filter(col("day") === date_add(col("d0"), 17))
      .agg(min(col("mn")).as("m0"))
    val evD = ev.crossJoin(broadcast(d0))
    // the substituted id (2nd-smallest of day d0+17) needs a corpus
    // pass — min/max per day are in the cells, the runner-up is not
    val subId = evD.crossJoin(broadcast(minSub))
      .filter(col("day") === date_add(col("d0"), 17) &&
        col("event_id") > col("m0"))
      .agg(min(col("event_id")).as("sub_x"))
    val replica = evD.crossJoin(broadcast(dropId))
      .crossJoin(broadcast(subId))
      .filter(col("day") =!= date_add(col("d0"), 3))
      .filter(!(col("day") === date_add(col("d0"), 10) &&
        col("event_id") === col("drop_x")))
      .select(col("day"),
        when(col("day") === date_add(col("d0"), 17) &&
            col("event_id") === col("sub_x"),
          col("event_id") + 1).otherwise(col("event_id")).as("event_id"))
    def sided(cellsDf: DataFrame, p: String): DataFrame =
      cellsDf.select(col("day"), col("n").as(s"n_$p"),
        col("mn").as(s"mn_$p"), col("mx").as(s"mx_$p"),
        Manifest.wrapSigned64(col("dg")).as(s"dg_$p"))
    def cells(src: DataFrame, p: String): DataFrame =
      sided(Manifest.dayCells(src, col("day"), col("event_id"),
        salt = 424242L), p)
    sided(cellsA, "a").join(cells(replica, "b"), Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        when(col("n_b").isNull, "missing")
          .when(col("n_a").isNull, "extra")
          .when(col("n_a") =!= col("n_b") ||
            col("mn_a") =!= col("mn_b") ||
            col("mx_a") =!= col("mx_b"), "count_drift")
          .when(col("dg_a") =!= col("dg_b"), "content_drift")
          .otherwise("match").as("status"))
      .orderBy(col("day"))
  }

  /** The RE-PULL plan derived from `manifest_diff`: non-match days
    * merged into minimal contiguous windows (gaps-and-islands:
    * day − row_number is constant exactly on consecutive runs), each
    * with its day span — the input a sync scheduler hands to the
    * date-range partitioned source (S4) to repair only what drifted.
    * The global window runs over the non-match DAY LIST — bounded by
    * |days|, never the corpus (the same |days|-wide economics as the
    * manifest itself), so the single-partition sort is a design
    * constant, not a scale hazard.
    */
  def backfillWindows(s: SparkSession, dir: String): DataFrame = {
    val bad = manifestDiff(s, dir)
      .filter(col("status") =!= "match").select(col("day"))
    val w = Window.orderBy(col("day"))
    bad.withColumn("rn", row_number().over(w))
      .withColumn("grp", date_sub(col("day"), col("rn")))
      .groupBy(col("grp"))
      .agg(min(col("day")).as("from_day"), max(col("day")).as("to_day"),
        count(lit(1)).as("n_days"))
      .select(col("from_day"), col("to_day"), col("n_days"))
      .orderBy(col("from_day"))
  }

  /** Small-file COMPACTION driven end-to-end ([[graft.ops.Sink
    * .compact]] — the K1 maintenance op every incremental sink needs
    * at scale: a year of 15-minute ticks is ~35k files/partition and
    * listing+open cost dominates reads long before data size does):
    * the events table is staged as 64 deliberately-tiny files, the
    * crash-recoverable swap compacts them, and the row emits what the
    * oracle can INDEPENDENTLY derive — the row count plus
    * content-preservation and file-reduction flags whose expected
    * values are invariants (1), with the checksum comparison
    * ([[graft.ops.Sink.tableChecksum]], order-invariant) and the
    * file-count assertion computed engine-side. A compaction that
    * loses or duplicates a row, or fails to reduce files, turns a
    * flag to 0 and hash-fails the gate.
    */
  def compactRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val staged = s"$base/events_small"
    val src = t(s, dir, "events")
    src.repartition(64).write.parquet(staged)
    val hPath = new Path(staged)
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    def nDataFiles: Int = {
      val it = fs.listFiles(hPath, true)
      var n = 0
      while (it.hasNext) {
        if (!it.next().getPath.getName.startsWith("_")) n += 1
      }
      n
    }
    val filesBefore = nDataFiles
    graft.ops.Sink.compact(s, staged)
    val filesAfter = nDataFiles
    val (nSrc, digSrc) = graft.ops.Sink.tableChecksum(src)
    val (nOut, digOut) =
      graft.ops.Sink.tableChecksum(s.read.parquet(staged))
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(base))
    import s.implicits._
    Seq((nOut,
      if (nSrc == nOut && digSrc.compareTo(digOut) == 0) 1 else 0,
      if (filesAfter < filesBefore) 1 else 0))
      .toDF("n_rows", "checksum_match", "files_reduced")
  }

  /** MERGE / CDC-apply (see [[graft.ops.Merge.upsert]]): a
    * deterministic change batch — sparse balance updates for
    * custkey % 10 = 3 (only the changed column rides, NULLs inherit),
    * deletes for % 10 = 7, brand-new inserts keyed at +10⁹ for
    * % 10 = 1 — applied to the customer snapshot in ONE full-outer
    * shuffle. The oracle replays the same MERGE as a full outer join
    * with per-column coalesce.
    */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val nullStr = lit(null).cast("string")
    val updates = cust.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey"), nullStr.as("c_name"),
        lit(null).cast("int").as("c_nationkey"),
        (col("c_acctbal") + 100.0).as("c_acctbal"),
        nullStr.as("c_mktsegment"), lit(false).as("_deleted"))
    val deletes = cust.filter(col("c_custkey") % 10 === 7)
      .select(col("c_custkey"), nullStr.as("c_name"),
        lit(null).cast("int").as("c_nationkey"),
        lit(null).cast("double").as("c_acctbal"),
        nullStr.as("c_mktsegment"), lit(true).as("_deleted"))
    val inserts = cust.filter(col("c_custkey") % 10 === 1)
      .select((col("c_custkey") + 1000000000L).as("c_custkey"),
        concat(lit("NEW_"), col("c_custkey")).as("c_name"),
        col("c_nationkey"), lit(0.0).as("c_acctbal"),
        lit("NEW").as("c_mktsegment"), lit(false).as("_deleted"))
    graft.ops.Merge.upsert(cust,
        updates.unionAll(deletes).unionAll(inserts), "c_custkey")
      .orderBy(col("c_custkey"))
  }

  /** Text-format round-trip gate (CSV + JSON-lines source/sink
    * breadth): `orders` — including its TIMESTAMP column, the
    * classic text-format casualty — written to each format and read
    * back under the source schema must reproduce the exact
    * order-independent table digest. Micros-precision timestampFormat
    * is pinned on BOTH write and read: Spark's default truncates to
    * millis, which this gate would catch as a digest mismatch.
    * n_rows is SQL-recomputed; equality flags pinned (the
    * sync_checksum pattern, widened to the two text formats).
    */
  def formatRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = t(s, dir, "orders")
    val (nSrc, ckSrc) = graft.ops.Sink.tableChecksum(src)
    val out = java.nio.file.Files
      .createTempDirectory("graft_fmt_gate").toString
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    // distinct NULL token: the default CSV read maps empty fields to
    // NULL, which would silently corrupt empty strings (unit-pinned
    // with hostile strings in AdvancedSpec; orders happens to carry
    // none, but the operator shouldn't depend on that)
    src.write.option("header", "true").option("timestampFormat", tsFmt)
      .option("nullValue", "\\N").csv(s"$out/csv")
    src.write.option("timestampFormat", tsFmt).json(s"$out/json")
    val csvBack = s.read.schema(src.schema).option("header", "true")
      .option("timestampFormat", tsFmt).option("nullValue", "\\N")
      .csv(s"$out/csv")
    val jsonBack = s.read.schema(src.schema)
      .option("timestampFormat", tsFmt).json(s"$out/json")
    // ORC is the third leg: a typed columnar format (no text-codec
    // ambiguity to harden against — the risk it pins is type fidelity
    // through a DIFFERENT columnar writer/reader than the parquet the
    // table came from)
    src.write.orc(s"$out/orc")
    val orcBack = s.read.schema(src.schema).orc(s"$out/orc")
    val (nCsv, ckCsv) = graft.ops.Sink.tableChecksum(csvBack)
    val (nJson, ckJson) = graft.ops.Sink.tableChecksum(jsonBack)
    val (nOrc, ckOrc) = graft.ops.Sink.tableChecksum(orcBack)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    Seq((nSrc,
        if (nCsv == nSrc) 1 else 0,
        if (ckCsv.compareTo(ckSrc) == 0) 1 else 0,
        if (nJson == nSrc) 1 else 0,
        if (ckJson.compareTo(ckSrc) == 0) 1 else 0,
        if (nOrc == nSrc) 1 else 0,
        if (ckOrc.compareTo(ckSrc) == 0) 1 else 0))
      .toDF("n_rows", "csv_rows_preserved", "csv_checksum_equal",
        "json_rows_preserved", "json_checksum_equal",
        "orc_rows_preserved", "orc_checksum_equal")
  }

  /** Stage `events` as `n` TIME-CONTIGUOUS single-file parquet splits
    * (`ev_0000.parquet` earliest, strictly increasing modification
    * times) so a file-source stream with `maxFilesPerTrigger = 1`
    * replays the table as `n` REAL micro-batches in event-time order.
    * This is what makes the driver-visible stream queries exercise
    * watermark advance and state-store hand-off ACROSS batches under
    * the same batch-equivalence oracles — a single symlinked file ran
    * everything in one batch, leaving the cross-batch contract to
    * unit tests only. Time-contiguity (boundary ties kept in the
    * earlier split) preserves per-user event order across batches,
    * which keeps the multi-batch replay equal to the global replay
    * the oracles recompute; exact quantile boundaries (relativeError
    * 0) keep the split deterministic. Staging cost is three filtered
    * scans of the SMALL events table in a test harness — the
    * production analogue is files simply arriving over time.
    */
  /** Staged split dirs are cached per (sfDir, n) for the session: four
    * stream queries × best-of-N bench runs would otherwise re-write
    * identical split files eight times per bench. The staged files are
    * immutable inputs (checkpoints stay per-invocation), so sharing is
    * safe; the few KB of temp files live until JVM exit.
    */
  private val stageCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int), java.nio.file.Path]

  private def stageEventsTimeSplit(s: SparkSession, dir: String,
                                   n: Int): java.nio.file.Path =
    stageCache.getOrElseUpdate((graft.Tables.versioned(dir), n),
      stageEventsTimeSplitUncached(s, dir, n))

  private def stageEventsTimeSplitUncached(s: SparkSession, dir: String,
                                           n: Int): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val stage = Files.createTempDirectory("graft_stream")
    val ev = Tables.raw(s, dir, "events")
    val withUs = ev.withColumn("__us", Tables.microsOf(ev, "ts"))
    // epoch-micros fit a Double's 53-bit mantissa exactly (≈1.8e15 ≪ 9e15)
    val bounds = withUs.stat
      .approxQuantile("__us", (1 until n).map(_.toDouble / n).toArray, 0.0)
      .map(_.toLong)
    val base = System.currentTimeMillis() - n * 60000L
    for (i <- 0 until n) {
      val lo = if (i == 0) lit(true) else col("__us") > bounds(i - 1)
      val hi = if (i == n - 1) lit(true) else col("__us") <= bounds(i)
      val tmp = stage.resolve(s"__tmp_$i")
      withUs.filter(lo && hi).drop("__us")
        .coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(p =>
        p.getFileName.toString.startsWith("part-")).findFirst().get()
      val dest = stage.resolve(f"ev_$i%04d.parquet")
      Files.move(part, dest)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 60000L))
    }
    stage
  }

  /** Multi-batch proof: fail loudly if a stream query that staged a
    * split directory did NOT actually run ≥2 non-empty micro-batches
    * (e.g. a future edit dropping maxFilesPerTrigger would silently
    * fall back to one batch and stop exercising cross-batch state).
    */
  private def requireMultiBatch(
      q: org.apache.spark.sql.streaming.StreamingQuery, what: String): Unit = {
    val n = q.recentProgress.count(_.numInputRows > 0)
    require(n >= 2, s"$what expected >=2 non-empty micro-batches, got $n")
  }

  /** Run a stream query body with state-partition count sized to the
    * LOCAL replay: every micro-batch commits one state-store instance
    * per shuffle partition, so 32 partitions × N batches × (per-side
    * join state) is pure fixed overhead on a 100k-row events table —
    * stream_join measured 16.6 s at 32 partitions vs single-digit at
    * 8, identical results. Production sizes this to state volume /
    * throughput (the knob is per-query at plan time; results are
    * partitioning-invariant, which the unchanged oracles pin).
    */
  private def withStreamStatePartitions[T](s: SparkSession)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, "8")
    try f finally s.conf.set(key, old)
  }

  /** Late-replay staging for [[streamLate]]: four files whose arrival
    * ORDER deliberately violates event-time order, so the watermark
    * policy has real work to do — (0) the first 20 days' on-time rows
    * (event_id % 4 ≠ 0), (1) days 21–25 on-time (this batch advances
    * the watermark past the early windows AND evicts them), (2) the
    * held-back rows of days 1–25 (the late replay feed, arriving one
    * batch AFTER the eviction — Spark's late filter uses the PREVIOUS
    * batch's watermark, so a replay landing in the same batch as the
    * watermark advance would still be merged), (3) days 26–30. The
    * cuts are date-truncated-min(ts)+20d / +25d — SQL-expressible, so
    * the oracle recomputes the exact file membership.
    */
  private def stageEventsLateSplit(s: SparkSession,
                                   dir: String): java.nio.file.Path =
    stageCache.getOrElseUpdate((graft.Tables.versioned(dir) + ":late", 4), {
      import java.nio.file.Files
      val stage = Files.createTempDirectory("graft_stream_late")
      val ev = Tables.raw(s, dir, "events")
      val withUs = ev.withColumn("__us", Tables.microsOf(ev, "ts"))
      val dayUs = 86400000000L
      val minUs = withUs.agg(min(col("__us"))).head().getLong(0)
      // UTC day truncation in epoch micros (events are post-1970)
      val cut = minUs / dayUs * dayUs + 20 * dayUs
      val mid = cut + 5 * dayUs
      val parts = Seq(
        col("__us") < cut && col("event_id") % 4 =!= 0,
        col("__us") >= cut && col("__us") < mid && col("event_id") % 4 =!= 0,
        col("__us") < mid && col("event_id") % 4 === 0,
        col("__us") >= mid)
      val base = System.currentTimeMillis() - parts.size * 60000L
      parts.zipWithIndex.foreach { case (p, i) =>
        val tmp = stage.resolve(s"__tmp_$i")
        withUs.filter(p).drop("__us")
          .coalesce(1).write.parquet(tmp.toString)
        val part = Files.list(tmp).filter(f =>
          f.getFileName.toString.startsWith("part-")).findFirst().get()
        val dest = stage.resolve(f"ev_$i%04d.parquet")
        Files.move(part, dest)
        org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 60000L))
      }
      stage
    })

  /** The NINETEENTH driver-visible stream shape — WATERMARK LATE-DATA
    * ACCOUNTING, the policy every production ingest must pick and
    * then be able to audit: a 36-hour-watermark daily count in APPEND
    * mode over a stage whose THIRD file replays held-back rows from
    * the first 25 days, one batch after the watermark advance that
    * finalized the early windows ([[stageEventsLateSplit]] — the
    * one-batch lag matters: Spark filters late events with the
    * PREVIOUS batch's watermark and evicts with the current one,
    * which is exactly what makes append-mode emission exactly-once;
    * measured here, not assumed). Three regimes land in one output:
    * replayed rows whose window the watermark had already passed are
    * DROPPED; replayed rows within the horizon are ACCEPTED late and
    * counted; windows are emitted exactly once. The output joins each
    * emitted window against the batch recount — (day_us, event_type,
    * n_stream, n_all, late_dropped) — so the drop policy's cost is a
    * per-window VALUE the oracle hash-checks, not a log line: early
    * windows show late_dropped = the held-back row count, horizon
    * windows show 0, and the last days (never finalized before
    * end-of-stream in append mode) are absent.
    *
    * Scale shape: state is one count cell per open (window, type) —
    * bounded by the watermark horizon, never stream length; the drop
    * decision is a scan-stage comparison against the broadcast
    * watermark. The oracle replays the whole policy in batch SQL:
    * file membership, the late-filter watermark (max event time minus
    * delay over the FIRST file — the value operative in the batch
    * before the replay arrives), the drop rule, and the finalization
    * rule (max event time overall minus delay).
    */
  def streamLate(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name =
      s"stream_late_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val stage = stageEventsLateSplit(s, dir)
    val src = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .withColumn("ts", Tables.eventTimeOf(schema, "ts"))
    val counts = graft.streaming.IncrementalStream
      .dailyCounts(src, "ts", "event_type", watermark = "36 hours")
    val q = counts.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_late")
    val emitted = s.table(name)
      .withColumnRenamed("n", "n_stream")
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val ev = Tables.raw(s, dir, "events")
    val statics = ev
      .select(Tables.eventTimeOf(schema, "ts").as("ts"), col("event_type"))
      .groupBy(date_trunc("DAY", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_all"))
    emitted.join(statics, Seq("day", "event_type"))
      .select(unix_micros(col("day")).as("day_us"), col("event_type"),
        col("n_stream"), col("n_all"),
        (col("n_all") - col("n_stream")).as("late_dropped"))
      .orderBy(col("day_us"), col("event_type"))
  }

  /** The TWENTIETH driver-visible stream shape — streaming DATA
    * QUALITY monitoring, the gate `dq_expectations` runs in batch
    * made continuous: every micro-batch reduces to per-RULE
    * (n_rows, n_fail) cells persisted to the batch-id-keyed store
    * (the manifest/HLL durability discipline), and the live report is
    * a sum-merge over the cell table — counts merge by ADDITION, so
    * any arrival split lands on the same totals, which is exactly
    * what lets the check run on the ingest path instead of as a
    * nightly batch scan of history. Three rule kinds cover the
    * expectation surface: null check, numeric range, domain
    * membership; fail RATIO in exact-integer e6 (non-negative, so DIV
    * replays).
    *
    * Scale shape: state per batch is |rules| cells — never rows; the
    * merged report reads |rules × batches| cells. The oracle is the
    * batch recompute over the full table (stream ≡ batch, the
    * `stream_daily` contract applied to governance).
    */
  def streamDq(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    // 3-batch contract (r12) — see streamTopk
    val stage = stageEventsTimeSplit(s, dir, n = 3)
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val store = java.nio.file.Files
      .createTempDirectory("graft_dqstore").toString
    val stream = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    def ruleCells(batch: DataFrame, rule: String,
                  fail: org.apache.spark.sql.Column): DataFrame =
      batch.agg(count(lit(1)).as("n_rows"),
          sum(when(fail, 1L).otherwise(0L)).as("n_fail"))
        .select(lit(rule).as("rule"),
          col("n_rows"), coalesce(col("n_fail"), lit(0L)).as("n_fail"))
    val persistBatch: (DataFrame, Long) => Unit = (batch, id) => {
      val cells = ruleCells(batch, "event_type_in_domain",
          !col("event_type").isin("click", "view", "purchase",
            "signup", "error"))
        .unionByName(ruleCells(batch, "user_id_not_null",
          col("user_id").isNull))
        .unionByName(ruleCells(batch, "value_in_0_50",
          col("value") < 0 || col("value") > 50))
        .persist()
      try {
        if (cells.agg(sum(col("n_rows"))).head().getLong(0) > 0)
          batches.incrementAndGet()
        graft.ops.Manifest.writeBatchCells(cells, store, id)
      } finally cells.unpersist()
    }
    val q = stream.writeStream.foreachBatch(persistBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    require(batches.get() >= 3,
      s"stream_dq expected >=3 non-empty micro-batches, got ${batches.get()}")
    val out = graft.ops.Dedup.materialize(
      s.read.parquet(store)
        .groupBy(col("rule"))
        .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_fail")).as("n_fail"))
        .withColumn("fail_e6", expr("n_fail * 1000000 DIV n_rows"))
        .orderBy(col("rule")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    out
  }

  /** Driver-visible Structured Streaming gate: the events table
    * replayed through a REAL streaming query (file source →
    * AvailableNow trigger → complete-mode memory sink), daily counts
    * per event type. The oracle recomputes the same aggregation in
    * batch SQL — proving the streaming path (micro-batch planner,
    * state store, sink commit) lands on exactly the batch answer,
    * which is Structured Streaming's core contract. Runs as ≥2 real
    * micro-batches (time-split stage + maxFilesPerTrigger=1).
    */
  def streamDailyCounts(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name = s"stream_daily_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    // the file source streams a DIRECTORY: stage the table as three
    // time-contiguous files so this runs as two real micro-batches
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val stream = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .withColumn("ts", Tables.eventTimeOf(schema, "ts"))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_daily")
    val out = s.table(name)
      .select(unix_micros(col("day").cast("timestamp")).as("day_us"),
        col("event_type"), col("n"))
      .orderBy(col("day_us"), col("event_type"))
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name) // release the memory sink's rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    // stage dir is session-cached (stageCache) — not deleted per query
    out
  }

  /** Stream–static enrichment join — the fourth streaming shape
    * (after windowed agg, stateful sessions, stream-stream join):
    * the events STREAM joined per-micro-batch to the STATIC customer
    * dimension (the planner broadcasts the dim into every batch — no
    * streaming state at all, which is the point of the shape), then a
    * per-(segment, event_type) count. The oracle recomputes the same
    * enriched aggregate in batch SQL.
    */
  def streamEnrich(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name = s"stream_enrich_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val dim = broadcast(t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment")))
    val stream = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_enrich")
    val out = s.table(name)
      .orderBy(col("c_mktsegment"), col("event_type"))
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name) // release the memory sink's rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    // stage dir is session-cached (stageCache) — not deleted per query
    out
  }

  /** Driver-visible STATEFUL streaming: gap-based sessionization via
    * `flatMapGroupsWithState` run as a real AvailableNow file-source →
    * memory-sink query, its closed-session output recomputed by the
    * batch oracle. Emission policy is pinned deterministic: the
    * watermark delay is set far beyond the data's time range, so
    * event-time timeouts never fire and EXACTLY the sessions closed by
    * a later out-of-gap event emit — i.e. every session except each
    * user's last, which the oracle expresses as a max-session
    * anti-filter over the same windowed-gap SQL as `sessionize`. (The
    * timeout path — late-closing open sessions once the watermark
    * passes end + gap — is deterministic only per watermark schedule,
    * so it is covered by StreamingSpec, not the oracle.) Proves the
    * custom-state contract (per-user (counter, open-session) state,
    * partitioned by user, monotone numbering) end-to-end, the way
    * `stream_daily` proves the windowed-aggregate contract.
    */
  def streamSessionize(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name = s"stream_sess_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val src = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .withColumn("ts", Tables.eventTimeOf(schema, "ts"))
    val sessions = graft.streaming.IncrementalStream
      .sessionizeStream(src, "user_id", "ts",
        gapMs = 30L * 60000L, watermark = "3650 days")
    val q = sessions.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_sessionize")
    val out = s.table(name)
      .orderBy(col("user_id"), col("session_id"))
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name) // release the memory sink's rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    // stage dir is session-cached (stageCache) — not deleted per query
    out
  }

  /** Driver-visible STREAM-STREAM join: click events joined to the
    * same user's purchase events within 24 h, both sides replayed
    * through REAL file-source streams into Spark's symmetric-hash
    * stream-stream join ([[graft.streaming.IncrementalStream
    * .intervalJoin]]). The watermark is set beyond the data's whole
    * time span, so no row is evicted before matching and the streamed
    * result equals the batch interval join — which the oracle
    * recomputes in SQL. Completes the streaming contract trio:
    * windowed aggregate (`stream_daily`), custom state
    * (`stream_sessionize`), and two-sided join state (this).
    */
  /** The NINTH driver-visible stream shape — STREAMING per-key EMA
    * ([[graft.streaming.IncrementalStream.emaStream]], α = 1/4): the
    * events stream replayed as ≥2 real micro-batches through
    * `flatMapGroupsWithState` carrying an ARITHMETIC accumulator
    * (rn, ema) per user — where sessionize's state is an interval and
    * dedup's is identity, this one is a numeric recurrence the next
    * batch CONTINUES from, the online-smoothing deployment of
    * `ema_smooth`. Time-contiguous staging preserves per-user order
    * across batches, so the streamed trajectory is BIT-EQUAL to the
    * batch recurrence and shares its oracle: the DuckDB RECURSIVE
    * CTE replay — cross-batch state hand-off hash-checked row by row.
    */
  def streamEma(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name = s"stream_ema_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val src = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .select(col("user_id"),
        unix_micros(Tables.eventTimeOf(schema, "ts")).as("us"),
        col("event_id"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v_e6"))
    val smoothed = graft.streaming.IncrementalStream
      .emaStream(src, aNum = 1, aDen = 4)
    val q = smoothed.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_ema")
    val out = s.table(name)
      .orderBy(col("user_id"), col("rn"))
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name) // release the memory sink's rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    // stage dir is session-cached (stageCache) — not deleted per query
    out
  }

  /** The TENTH driver-visible stream shape — STREAMING anomaly
    * flagging ([[graft.streaming.IncrementalStream.anomalyStream]],
    * α = 1/4, k = 5/2, floor 0.5, warm-up 3): the events stream
    * replayed as ≥2 real micro-batches through
    * `flatMapGroupsWithState` carrying (rn, ema, dev) per user and
    * EMITTING A DECISION per row — where stream_ema's state feeds a
    * later reader, this one acts online, the alerting path of a
    * metrics pipeline. Time-contiguous staging preserves per-user
    * order across batches, so the streamed flag trajectory is
    * BIT-EQUAL to the batch operator's and shares `ema_anomaly`'s
    * RECURSIVE-CTE oracle — cross-batch (rn, ema, dev) hand-off
    * hash-checked row by row, including the flags themselves.
    */
  def streamAnomaly(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name = s"stream_anomaly_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val src = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .select(col("user_id"),
        unix_micros(Tables.eventTimeOf(schema, "ts")).as("us"),
        col("event_id"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v_e6"))
    val flagged = graft.streaming.IncrementalStream
      .anomalyStream(src, aNum = 1, aDen = 4, kNum = 5, kDen = 2,
        minDevE6 = 500000L, warmup = 3L)
    val q = flagged.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_anomaly")
    val out = s.table(name)
      .orderBy(col("user_id"), col("rn"))
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name) // release the memory sink's rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    // stage dir is session-cached (stageCache) — not deleted per query
    out
  }

  def streamJoin(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name = s"stream_join_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    // two independent sources (not a self-join of one frame), the
    // shape real pipelines have: clicks and purchases arrive as
    // separate streams; each replays its 3 staged files as 3 batches
    def side(evType: String): DataFrame = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .withColumn("ts", Tables.eventTimeOf(schema, "ts"))
      .filter(col("event_type") === evType)
    val clicks = side("click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val buys = side("purchase")
      .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val joined = graft.streaming.IncrementalStream
      .intervalJoin(clicks, "click_ts", buys, "buy_ts",
        col("user_id") === col("buy_user"), "24 hours", "3650 days")
      .select(col("user_id"), col("click_id"), col("buy_id"),
        unix_micros(col("click_ts").cast("timestamp")).as("click_us"),
        unix_micros(col("buy_ts").cast("timestamp")).as("buy_us"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_join")
    val out = s.table(name)
      .orderBy(col("user_id"), col("click_id"), col("buy_id"))
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name) // release the memory sink's rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    // stage dir is session-cached (stageCache) — not deleted per query
    out
  }

  /** The ELEVENTH driver-visible stream shape — stream-stream LEFT
    * OUTER interval join ([[graft.streaming.IncrementalStream
    * .intervalJoinOuter]]): clicks with no purchase within 24 h emit
    * null-extended, but ONLY once the watermark (1 h delay) passes
    * the click's window — the state-EVICTION semantics the inner
    * `stream_join` never exercises, and the one that bounds join
    * state at 100 TB (an uncloseable window would be unbounded
    * state). Clicks whose window the final watermark never closes
    * stay in state unemitted — the oracle excludes exactly those
    * (click_us + 24 h ≥ max event time − 1 h). Time-contiguous
    * staging makes eviction RACE-FREE: an evicted click can never
    * have matched a later purchase, because later batches start past
    * the watermark that evicted it — so the streamed set equals
    * (batch inner join) ∪ (unmatched, window-closed clicks),
    * which the oracle recomputes.
    */
  def streamOuterJoin(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name = s"stream_ojoin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    def side(evType: String): DataFrame = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .withColumn("ts", Tables.eventTimeOf(schema, "ts"))
      .filter(col("event_type") === evType)
    val clicks = side("click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val buys = side("purchase")
      .select(col("user_id").as("buy_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val joined = graft.streaming.IncrementalStream
      .intervalJoinOuter(clicks, "click_ts", buys, "buy_ts",
        col("user_id") === col("buy_user"), "24 hours", "1 hour")
      .select(col("user_id"), col("click_id"), col("buy_id"),
        unix_micros(col("click_ts").cast("timestamp")).as("click_us"),
        unix_micros(col("buy_ts").cast("timestamp")).as("buy_us"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_outer_join")
    val out = s.table(name)
      .orderBy(col("user_id"), col("click_id"), col("buy_id"))
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name) // release the memory sink's rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    // stage dir is session-cached (stageCache) — not deleted per query
    out
  }

  /** Driver-visible STREAMING DEDUPLICATION — the fifth streaming
    * shape (after windowed agg, stream-static enrich, custom state,
    * and two-sided join state: KEYED DEDUP STATE): first occurrence
    * of each (user_id, event_type, day) key across the multi-batch
    * replay via [[graft.streaming.IncrementalStream
    * .dedupKeysWithinWatermark]] (Spark's
    * `dropDuplicatesWithinWatermark`). Only KEY columns are emitted,
    * so the result is arrival-order-independent and equals batch
    * `SELECT DISTINCT` — which the oracle recomputes. The
    * cross-batch contract this pins: a key first seen in batch 1 and
    * repeated in batch 2 must NOT re-emit, i.e. dedup state genuinely
    * survives the state-store reload at the batch boundary. The
    * watermark delay is what bounds state at scale (evicted keys
    * re-emit on re-arrival — StreamingSpec covers that path with
    * hand-built batches); here it spans the whole replay so the
    * streamed answer is exactly DISTINCT.
    */
  def streamDedup(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val schema = Tables.raw(s, dir, "events").schema
    val name = s"stream_dedup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val src = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .withColumn("ts", Tables.eventTimeOf(schema, "ts"))
      .withColumn("day", to_date(col("ts")))
    val deduped = graft.streaming.IncrementalStream
      .dedupKeysWithinWatermark(src, "ts", "3650 days",
        Seq("user_id", "event_type", "day"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("day").cast("timestamp")).as("day_us"))
    val q = deduped.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_dedup")
    val out = s.table(name)
      .orderBy(col("user_id"), col("event_type"), col("day_us"))
      .localCheckpoint(true) // pin: the memory table dies with the query
    q.stop()
    s.catalog.dropTempView(name) // release the memory sink's rows
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    // stage dir is session-cached (stageCache) — not deleted per query
    out
  }

  /** SIXTH driver-visible stream shape: streaming CDC apply — each
    * micro-batch of the event stream becomes a keyed change batch
    * (per-user latest event; `error` as terminal type ⇒ tombstone)
    * applied to a persistent snapshot with [[graft.ops.Merge.upsert]]
    * inside `foreachBatch`, writing a NEW immutable snapshot version
    * per batch (read vN → merge → write vN+1 — the Delta/Iceberg
    * MERGE loop without a table format; never read-and-overwrite the
    * same path). Because the staged splits are time-contiguous and
    * batches apply in file order, a key's final row is written by the
    * last batch containing that key, so the end state is a pure
    * function of each user's GLOBALLY latest event — which is what
    * the batch-SQL oracle recomputes (latest by (ts, event_id);
    * absent if that event is an `error`). At scale each batch pays
    * one full-outer shuffle on the key (bucketing the snapshot
    * removes its exchange — Merge scaladoc) and the snapshot turns
    * over incrementally; driver holds no row data.
    */
  def streamCdc(s: SparkSession, dir: String): DataFrame =
      withStreamStatePartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.Row
    val schema = Tables.raw(s, dir, "events").schema
    val ckpt = graft.streaming.IncrementalStream.localCkptDir(s)
    val snapRoot = java.nio.file.Files.createTempDirectory("graft_cdc")
    val stage = stageEventsTimeSplit(s, dir, n = 2)
    val targetSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        schema("user_id").dataType, nullable = false),
      org.apache.spark.sql.types.StructField("event_id",
        schema("event_id").dataType, nullable = true),
      org.apache.spark.sql.types.StructField("etype",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val current = new java.util.concurrent.atomic.AtomicReference[String]
    current.set(snapRoot.resolve("v0").toString)
    s.createDataFrame(java.util.Collections.emptyList[Row](), targetSchema)
      .write.parquet(current.get)
    val applyBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
      // per-user latest event IN THIS BATCH (event_id breaks ts ties)
      val changes = batch
        .withColumn("ts_us", Tables.microsOf(batch, "ts"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts_us"), col("event_id"),
          col("event_type"), col("value"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("event_id"),
          col("m.event_type").as("etype"), col("m.ts_us").as("ts_us"),
          col("m.value").as("value"),
          (col("m.event_type") === "error").as("_deleted"))
      val next = snapRoot.resolve(s"v${batchId + 1}").toString
      graft.ops.Merge.upsert(s.read.parquet(current.get), changes, "user_id")
        .write.parquet(next)
      current.set(next)
    }
    val q = graft.streaming.IncrementalStream
      .readAppendStream(s, stage.toString, schema, maxFilesPerTrigger = Some(1))
      .writeStream.foreachBatch(applyBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    requireMultiBatch(q, "stream_cdc")
    val out = s.read.parquet(current.get)
      .select(col("user_id"), col("event_id"), col("etype"), col("ts_us"),
        round(col("value"), 4).as("value_r"))
      .orderBy(col("user_id"))
      .localCheckpoint(true) // pin: snapshot files are deleted below
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    org.apache.commons.io.FileUtils.deleteQuietly(snapRoot.toFile)
    out
  }

  /** Full outer join coverage (§2.7 — the one join shape broadcast
    * can't serve): per-nation customer/supplier account totals where
    * either side may be absent.
    */
  def joinOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
      .agg(round(sum(col("c_acctbal")), 2).as("cust_bal"))
    val p = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
      .agg(round(sum(col("s_acctbal")), 2).as("supp_bal"))
    c.join(p, Seq("nk"), "full_outer")
      .select(col("nk"), col("cust_bal"), col("supp_bal"))
      .orderBy(col("nk"))
  }

  /** Ranking-window family in one query: rank, dense_rank,
    * percent_rank, cume_dist, ntile(4) over each segment's customers
    * by balance (§2.8 breadth beyond row_number).
    */
  def windowRanks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"),
        round(cume_dist().over(w), 6).as("cdist"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
  }

  /** CDC snapshot diff over a deterministic second version of
    * lineitem — rows with orderkey ≡ 0 (mod 97) deleted, quantity
    * bumped where ≡ 0 (mod 89), and new rows (negated keys) cloned
    * from ≡ 0 (mod 83) — classified by
    * [[graft.ops.Sink.tableDiff]] and rolled up per status. The
    * oracle recomputes each class's count directly from the modular
    * arithmetic, so the whole digest-join machinery is value-checked.
    */
  def tableDiff(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val kept = li.filter(col("l_orderkey") % 97 =!= 0)
    val changed = kept.withColumn("l_quantity",
      when(col("l_orderkey") % 89 === 0, col("l_quantity") + 1)
        .otherwise(col("l_quantity")))
    val added = kept.filter(col("l_orderkey") % 83 === 0)
      .withColumn("l_orderkey", -col("l_orderkey"))
    val after = changed.unionByName(added)
    // key = every column EXCEPT the mutated one: neither (orderkey,
    // linenumber) nor the 4-column business key is unique at EVERY SF
    // (sf0.001 has one colliding 4-col pair), but the non-quantity
    // columns are (verified at all three SFs) — and the mutation only
    // touches l_quantity, so keys are stable across versions
    val counts = graft.ops.Sink.tableDiff(li, after,
        keyCols = li.columns.filterNot(_ == "l_quantity").toSeq)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
    // every class always present (n=0 when empty) — the oracle's
    // UNION ALL emits all four rows unconditionally
    import s.implicits._
    Seq("added", "changed", "removed", "unchanged").toDF("status")
      .join(counts, Seq("status"), "left")
      .select(col("status"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("status"))
  }

  /** Event-transition matrix (first-order Markov counts): for each
    * user's time-ordered event stream, count (previous type → next
    * type) transitions — one lag window + one aggregate, single
    * shuffle on user_id. The behavioral-analytics primitive funnels
    * and session models start from.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Per-key skew diagnostic over the events fact: the row-count
    * distribution across user keys (p50/p90/max by exact integer
    * rank, plus the max/median ratio ×100) — the numbers that decide
    * whether a join needs salting or AQE skew handling BEFORE it runs.
    */
  /** Equi-depth decile histogram of document lengths — exact NTILE
    * semantics WITHOUT the single-reducer global window `ntile()`
    * plans (WindowExec with no partition keys moves the whole table
    * to one task). The global 0-based rank is decomposed two-level,
    * the same discipline as `pack_sequences`/`pps_sample`:
    * per-VALUE counts (keyed agg) → cumulative offsets on the sorted
    * distinct length domain (the only unpartitioned window, over the
    * distinct-value table — bounded domain; a truly continuous
    * column would band first, identically to `skew_stats`) →
    * within-value row_number keyed BY the value. NTILE's
    * bigger-tiles-first arithmetic is then per-row integer math
    * against the broadcast 1-row total: the first N%10 tiles take
    * ⌈N/10⌉ rows. The oracle is DuckDB's own `ntile(10)` over the
    * identical total order, so the decomposition is pinned equal to
    * the textbook definition.
    */
  def lengthDeciles(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val vc = d.groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
    val off = vc.withColumn("off",
        sum(col("c")).over(Window.orderBy(col("n_chars"))) - col("c"))
      .select(col("n_chars"), col("off"))
    val ranked = d.withColumn("rw",
        row_number().over(
          Window.partitionBy(col("n_chars")).orderBy(col("doc_id")))
          .cast("long") - 1)
      .join(broadcast(off), "n_chars")
      .withColumn("r0", col("off") + col("rw"))
    val total = d.agg(count(lit(1)).as("n_total"))
    ranked.crossJoin(broadcast(total))
      .withColumn("decile", expr(
        """CAST(CASE
             WHEN r0 < (n_total % 10) * (n_total DIV 10 + 1)
             THEN r0 DIV (n_total DIV 10 + 1)
             ELSE (n_total % 10)
                  + (r0 - (n_total % 10) * (n_total DIV 10 + 1))
                    DIV (n_total DIV 10)
           END + 1 AS BIGINT)"""))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_len"),
        max(col("n_chars")).as("max_len"))
      .orderBy(col("decile"))
  }

  def skewStats(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    // Exact ranks WITHOUT sorting the per-key counts table globally:
    // aggregate counts-of-counts (distinct per-key row-count values —
    // a domain bounded by max_c, orders of magnitude below |keys|),
    // then read the p50/p90 boundaries off a cumulative sum over that
    // tiny table. A value c holds ranks (cum-k, cum]; the percentile
    // is the c whose interval covers the target rank. Billions of user
    // keys still reduce to a few thousand (c, k) rows before any
    // ordered window runs — the at-scale sketch swap is
    // percentile_approx (error pinned by the percentile_bound gate).
    val cc = counts.groupBy(col("c")).agg(count(lit(1)).as("k"))
    val wCum = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cc.withColumn("cum", sum(col("k")).over(wCum))
      .withColumn("n", sum(col("k")).over(wAll))
      .withColumn("r50", expr("(n + 1) DIV 2"))
      .withColumn("r90", expr("(9 * n + 9) DIV 10"))
      .agg(
        max(col("n")).as("n_keys"),
        max(when(col("cum") >= col("r50") &&
          col("cum") - col("k") < col("r50"), col("c"))).as("p50"),
        max(when(col("cum") >= col("r90") &&
          col("cum") - col("k") < col("r90"), col("c"))).as("p90"),
        max(col("c")).as("max_c"))
      .select(col("n_keys"), col("p50"), col("p90"), col("max_c"),
        expr("(100 * max_c) DIV p50").as("skew_ratio_pct"))
  }

  /** Incremental materialized-aggregate maintenance
    * ([[graft.ops.Incremental.aggState]]/`mergeAggStates`): the
    * per-month order rollup is maintained as an algebraic state
    * (cnt, cent-sum, min, max), the table is split at a cutoff into
    * "history" and "delta", each side aggregated independently, and
    * the two states merged. The oracle is the FULL recompute — the
    * maintenance contract is that merge(state(old), state(new)) is
    * indistinguishable from recomputing over everything. Money rides
    * as exact integer cents so the merged sum is bit-identical, not
    * merely close (same policy as `q14_promo_share`); avg is
    * finalized from the merged state, never merged.
    *
    * At 100 TB the history side is an already-materialized |groups|-row
    * table and only the delta partition is scanned — this query shape
    * is why the nightly rollup doesn't reread the lake.
    */
  def aggIncremental(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").select(
      date_trunc("month", col("o_orderdate")).cast("date").as("month"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_totalprice").as("p"))
    val cutoff = lit("1999-01-01").cast("date")
    def state(part: DataFrame): DataFrame =
      graft.ops.Incremental.aggState(part, Seq("month"), Seq(
        count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"),
        min(col("p")).as("min_price"), max(col("p")).as("max_price")))
    val merged = graft.ops.Incremental.mergeAggStates(
      Seq(state(orders.filter(col("month") < cutoff)),
        state(orders.filter(col("month") >= cutoff))),
      Seq("month"), Seq(
        sum(col("cnt")).as("cnt"), sum(col("sum_cents")).as("sum_cents"),
        min(col("min_price")).as("min_price"),
        max(col("max_price")).as("max_price")))
    // avg finalized in exact integer cents (floored division): a
    // 4-dp double round hits representation ties (227673.41875
    // rounded differently by Spark and DuckDB at sf0.01)
    merged.select(col("month"), col("cnt"), col("sum_cents"),
        expr("sum_cents DIV cnt").as("avg_cents"),
        col("min_price"), col("max_price"))
      .orderBy(col("month"))
  }

  /** Incremental JOIN-view maintenance ([[graft.ops.Incremental
    * .joinDelta]]): the orders⋈lineitem view is maintained as
    * V_old ∪ Δ — with Δ = Δorders⋈lineitem_new ∪ orders_old⋈Δlineitem
    * — instead of re-joining the full tables; both tables change
    * (orders split on o_orderdate, lineitem independently on
    * l_shipdate), covering all three delta products. The maintained
    * view is then aggregated per priority and the oracle recomputes
    * the aggregate from the FULL join — a hash match proves the
    * delta algebra reproduced the recompute exactly. Money rides as
    * exact integer cents (same bit-identity policy as
    * `agg_incremental`).
    *
    * At 100 TB: V_old is an already-materialized table; this query's
    * two delta joins are the only work a nightly refresh pays, and
    * each has a broadcastable delta side.
    */
  def joinIncremental(s: SparkSession, dir: String): DataFrame = {
    val cutO = lit("1997-06-01")
    val cutL = lit("1997-09-01")
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority"),
        col("o_orderdate"))
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_shipdate"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val (oOld, oDelta) = (orders.filter(col("o_orderdate") < cutO),
      orders.filter(col("o_orderdate") >= cutO))
    val (lOld, lDelta) = (li.filter(col("l_shipdate") < cutL),
      li.filter(col("l_shipdate") >= cutL))
    val vOld = oOld.join(lOld, Seq("k"))
    val maintained = vOld.unionByName(
      graft.ops.Incremental.joinDelta(oOld, oDelta, lOld, lDelta, Seq("k")))
    maintained.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("k")).as("n_orders"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("o_orderpriority"))
  }

  /** Data-quality expectation report ([[graft.ops.Expectations]]):
    * the pre-load QA gate a production sync runs. All row-level
    * checks for a table ride ONE aggregate over one scan
    * (conditional sums + count/count_distinct pairs, unpivoted to
    * report rows); referential checks are broadcast anti-joins.
    * Two checks are deliberately violated by this corpus
    * (o_totalprice cap, o_orderpriority set) so the report proves it
    * counts, not just flags.
    */
  /** Top-3 orders by price per market segment via the EXACT bounded
    * [[graft.functions.TopKMax]] aggregator — top-k per key WITHOUT a
    * ranking window: the window form shuffles every order row to its
    * segment's reducer; the aggregator's partial state is ≤ 3 rows
    * per segment per partition, map-side combined, so the shuffle
    * carries k·segments·partitions structs regardless of table size.
    * Price enters as exact cents (floor(x·100 + 0.5) — an identical
    * IEEE sequence in both engines, per the OPERATORS.md cast trap).
    * The oracle IS the window definition (row_number ≤ 3 over
    * cents DESC, orderkey ASC), so the aggregation path is pinned
    * equal to the textbook semantics.
    */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKMax.topk_max
    val j = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"),
        col("o_orderkey"))
    j.groupBy(col("seg"))
      .agg(topk_max(col("cents"), col("o_orderkey"), 3).as("top"))
      .select(col("seg"), posexplode(col("top")))
      .select(col("seg"), (col("pos") + 1).cast("int").as("rank"),
        col("col.v").as("cents"), col("col.id").as("o_orderkey"))
      .orderBy(col("seg"), col("rank"))
  }

  /** U-shaped multi-touch attribution (the marketing-analytics
    * workhorse): every click/view attributes to the user's NEXT
    * purchase; within each purchase's touch sequence the first and
    * last touch get 40% credit each and the middles share the
    * remaining 20% (n=1 → 100%, n=2 → 50/50). Credits are exact e6
    * integers that sum to exactly 10⁶ per purchase: the middle share
    * is 200000 DIV m with the remainder distributed one µ-credit at
    * a time to the earliest middles — deterministic, no floats.
    * The touch→purchase assignment needs no interval join: one keyed
    * cumulative window (purchases-so-far per user) gives every touch
    * its target purchase INDEX, and an equi-join on (user, index)
    * lands it — the same trick sessionize uses, all windows keyed by
    * user_id. Output: per touch type, total touches and credit.
    */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val rawEv = Tables.raw(s, dir, "events")
    val ev = rawEv.select(col("user_id"), col("event_id"),
      col("event_type"), Tables.microsOf(rawEv, "ts").as("tsu"))
      .filter(col("event_type").isin("click", "view", "purchase"))
    val seq = Window.partitionBy(col("user_id"))
      .orderBy(col("tsu"), col("event_id"))
    val marked = ev.withColumn("pcum",
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(seq))
    val purchases = marked.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("pcum").as("p_idx"))
    val touches = marked.filter(col("event_type") =!= "purchase")
      .withColumn("p_idx", col("pcum") + 1L)
      .join(purchases, Seq("user_id", "p_idx"))
    val grp = Window.partitionBy(col("user_id"), col("p_idx"))
    val ranked = touches
      .withColumn("r", row_number().over(
        grp.orderBy(col("tsu"), col("event_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(grp))
    ranked.withColumn("credit_e6", expr(
        """CASE WHEN n = 1 THEN 1000000
                WHEN n = 2 THEN 500000
                WHEN r = 1 OR r = n THEN 400000
                ELSE 200000 DIV (n - 2)
                     + (CASE WHEN r - 1 <= 200000 % (n - 2)
                        THEN 1 ELSE 0 END)
           END"""))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_e6")).as("credit_e6"))
      .orderBy(col("event_type"))
  }

  /** k-anonymity audit over the quasi-identifier lattice — the
    * pre-export governance check that decides SUPPRESS vs GENERALIZE
    * (Sweeney 2002, k-anonymity; the `forget_user`/`pii_scrub`
    * family's third member): customers grouped by the full QI
    * (nation, segment, account-balance band) and, from the SAME cell
    * table, by the generalized QI (nation, segment — the band
    * generalized away), reporting per nation how many rows sit in
    * groups smaller than k=8 at each level. The lattice walk is one
    * corpus scan: level 0 is a hash aggregate to |QI-combination|
    * cells, level 1 re-aggregates those CELLS (never rows), so the
    * generalization tradeoff — risky rows that suppression would drop
    * vs what coarsening the band rescues — costs |cells|, not a
    * second scan. Balance bands are exact power-of-two cents
    * divisions (floor(cents/2¹⁸) — the quantile_hist floor-division
    * discipline, sign-safe for negative balances), so both engines
    * bin bit-identically. At 100 TB the cell table is bounded by the
    * QI domain (|nations|×|segments|×|bands|), not the row count.
    */
  def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    // pinned: both lattice levels read the cell table — without the
    // pin the l0 and l1 branches each re-scan the corpus
    val cells = graft.ops.Dedup.materialize(t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(floor(col("c_acctbal") * 100 + 0.5) / lit(262144.0))
          .cast("long").as("band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
      .agg(count(lit(1)).as("n")))
    val l0 = cells.groupBy(col("c_nationkey"))
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("l0_groups"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("l0_risky_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L))
          .as("l0_risky_rows"))
    val l1 = cells.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("n")).as("m"))
      .groupBy(col("c_nationkey"))
      .agg(sum(when(col("m") < k, col("m")).otherwise(0L))
        .as("l1_risky_rows"))
    l0.join(l1, Seq("c_nationkey"))
      .select(col("c_nationkey"), col("n_rows"), col("l0_groups"),
        col("l0_risky_groups"), col("l0_risky_rows"),
        col("l1_risky_rows"))
      .orderBy(col("c_nationkey"))
  }

  /** GDPR/right-to-be-forgotten cascade audit: given a deletion set
    * of customer keys (here `c_custkey % 97 = 0`), delete the
    * customers, their orders, the lineitems of those orders (the
    * TWO-hop cascade — the step ad-hoc deletion scripts forget), and
    * their events; report per table rows before / deleted / after
    * plus an engine-computed orphan count (surviving rows that still
    * reference a deleted key — must be zero). Plan shape: the
    * deletion set is a broadcast dimension; every delete is a
    * LEFT ANTI join and every audit a LEFT SEMI, all keyed — at
    * 100 TB this is exactly the fan-out a tombstone-compaction job
    * pays, one anti-join per table per deletion batch. The oracle
    * recomputes before/deleted/after independently and states the
    * orphan INVARIANT (0) rather than copying the engine's count, so
    * a broken cascade (e.g. lineitem skipped) hash-fails.
    */
  def forgetUser(s: SparkSession, dir: String): DataFrame = {
    // deletion sets PINNED (tiny key lists): un-pinned, each of the
    // many broadcast uses below re-derived them from a fresh
    // customer/orders scan — the r9 multi-scan audit found the first
    // draft's plan carried 36 parquet scans; this shape carries 10
    // (one flag-agg pass + one post-delete orphan audit per table,
    // plus the two pinned key sets), the floor that keeps the orphan
    // check a REAL scan of the post-delete frame rather than an
    // arithmetic identity
    val del = graft.ops.Dedup.materialize(
      t(s, dir, "customer").filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey").as("k")))
    def row(tbl: String, all: DataFrame, key: Column,
            delKeys: DataFrame): DataFrame = {
      // before/deleted from ONE pass: a broadcast left join marks
      // doomed rows, the aggregate counts rows and marks together
      val cnts = all
        .join(broadcast(delKeys.withColumn("__hit", lit(1))),
          key === col("k"), "left")
        .agg(count(lit(1)).as("n_before"),
          count(col("__hit")).as("n_deleted"))
      // the orphan audit stays a SECOND genuine pass over the
      // post-delete frame (in production it runs against the written
      // table after the delete commits)
      val after = all.join(broadcast(delKeys), key === col("k"), "left_anti")
      val orphans = after.join(broadcast(delKeys), key === col("k"), "left_semi")
      cnts.crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(tbl).as("tbl"), col("n_before"), col("n_deleted"),
          (col("n_before") - col("n_deleted")).as("n_after"),
          col("n_orphans"))
    }
    val customer = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    val lineitem = t(s, dir, "lineitem")
    val events = Tables.raw(s, dir, "events")
    val deadOrders = graft.ops.Dedup.materialize(orders
      .join(broadcast(del), col("o_custkey") === col("k"), "left_semi")
      .select(col("o_orderkey").as("k")))
    row("customer", customer, col("c_custkey"), del)
      .unionByName(row("orders", orders, col("o_custkey"), del))
      .unionByName(row("lineitem", lineitem, col("l_orderkey"), deadOrders))
      .unionByName(row("events", events, col("user_id"), del))
      .orderBy(col("tbl"))
  }

  /** Single-pass dataset profiling (the ANALYZE/data-catalog shape):
    * per-column non-null and exact distinct counts for every `orders`
    * column, computed in ONE aggregate over ONE scan — Spark plans
    * the multi-distinct aggregate with Expand (k-fold row expansion
    * feeding partial aggregates), so the table is still read once and
    * every partial is map-side combined. The wide 1-row result then
    * unpivots via `stack` into the catalog row shape. At 100 TB the
    * exact-distinct Expand is the knob to turn: [[profileSketch]] IS
    * that turn — the same one-scan stack shape with the house HLL
    * replacing exact distinct, every estimate value-checked. Counts
    * only — min/max stay typed in the
    * engine and are deliberately not stringified here, so the oracle
    * needs no cross-engine number-formatting contract.
    */
  def profileTable(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val stacked = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    t(s, dir, "orders")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(
        s"stack(${cols.size}, $stacked) AS (column_name, n_non_null, n_distinct)"))
      .select(col("column_name"), col("n_non_null"), col("n_distinct"),
        col("n_rows"))
      .orderBy(col("column_name"))
  }

  /** SKETCH-based dataset profiling — the 100 TB form
    * [[profileTable]]'s scaladoc promises ("swap countDistinct →
    * approx on the same plan"), made real with the house HLL
    * ([[graft.ops.Hll]]) so the per-column ESTIMATES are
    * value-checked, not gate-bounded. One events scan `stack`s four
    * int64-keyed column views into (col_name, k) rows; the pinned
    * distinct pair set feeds both the register sketch (shuffle ≤
    * 4 × 1024 cells) and the exact companion the profile compares
    * against, and the RAW rows feed the second sketch family
    * (round 11): a per-column mergeable QUANTILE histogram — ≤4096
    * equi-width bins whose width is derived from the column's own
    * [min, max] as binw = ⌈(mxk−mnk+1)/4096⌉ (all integer, so the
    * p50/p90 bin-edge ESTIMATES replay in SQL like `quantile_hist`'s;
    * `(k−mnk) DIV binw` is floor-safe because k ≥ mnk by
    * construction). Profile state per column: 1024 HLL registers +
    * ≤4096 count cells + 3 moments — every piece merges (max / + /
    * min-max), which is what makes the profiler a one-pass,
    * re-aggregatable ANALYZE at 100 TB. The exact-distinct arm is the
    * thing you drop at scale; the sketch arms' shuffles are
    * corpus-size-independent past the scan (measured exponent 0.32
    * for the HLL shape, SCALE.md).
    */
  def profileSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Hll
    val raw = graft.ops.Dedup.materialize(
      t(s, dir, "events").select(expr(
        "stack(4, " +
          "'user_id', user_id, " +
          "'event_id', event_id, " +
          "'day', CAST(datediff(to_date(ts), DATE'1970-01-01') AS BIGINT), " +
          "'value_e4', CAST(floor(value * 10000 + 0.5) AS BIGINT)" +
        ") AS (col_name, k)"))
      .filter(col("k").isNotNull))
    val pairs = graft.ops.Dedup.materialize(raw.distinct())
    val est = Hll.distinctCount(pairs, Seq("col_name"), col("k"),
      salt = 99L, outCol = "approx_distinct")
    val exact = pairs.groupBy(col("col_name"))
      .agg(count(lit(1)).as("exact_distinct"))
    // quantile histogram: per-column integer bin width from the
    // column's own range, capped at 4096 bins; rank-edge p50/p90 over
    // the cumulative cells (the quantile_hist discipline, per column)
    val stats = raw.groupBy(col("col_name"))
      .agg(min(col("k")).as("mnk"), max(col("k")).as("mxk"),
        count(lit(1)).as("n_values"))
      .withColumn("binw", expr("(mxk - mnk + 4096) DIV 4096"))
    val cells = raw.join(broadcast(stats), Seq("col_name"))
      .groupBy(col("col_name"), expr("(k - mnk) DIV binw").as("bin"))
      .agg(count(lit(1)).as("c"))
    val cum = cells
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("col_name")).orderBy(col("bin"))))
      .withColumn("n", sum(col("c"))
        .over(Window.partitionBy(col("col_name"))))
    val quant = cum.groupBy(col("col_name"))
      .agg(min(when(col("cum") >= expr("(n + 1) DIV 2"), col("bin")))
          .as("b50"),
        min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("bin")))
          .as("b90"))
    val prof = quant.join(stats, Seq("col_name"))
      .select(col("col_name"), col("n_values"), col("binw"),
        (col("mnk") + col("b50") * col("binw")).as("p50_est"),
        (col("mnk") + col("b90") * col("binw")).as("p90_est"))
    est.join(exact, Seq("col_name")).join(prof, Seq("col_name"))
      .orderBy(col("col_name"))
  }

  /** Referential-integrity audit over every foreign-key edge of the
    * warehouse — the conformance sweep a load job runs after commit
    * (the `dq_expectations` family's cross-TABLE member; single-table
    * rules can't see a dangling key): per edge, child rows and orphan
    * rows (child keys with no parent), with the ok flag stating the
    * zero-orphan INVARIANT the same way `forget_user` pins its
    * cascade. Plan: each edge is one keyed LEFT join against the
    * DISTINCT parent-key projection (column-pruned to the key;
    * Catalyst broadcasts the dim-sized ones) folded into a 1-row
    * conditional aggregate — at 100 TB this is one key-shuffle per
    * edge, the price of the check, with no row ever leaving its
    * aggregate. Seven edges cover the full FK graph incl. the
    * events→customer bridge.
    */
  def riAudit(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
             parent: DataFrame, pk: String): DataFrame =
      child.select(col(ck).cast("long").as("k"))
        .join(parent.select(col(pk).cast("long").as("k")).distinct()
          .withColumn("hit", lit(1)), Seq("k"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("relationship"), col("n_child"),
          coalesce(col("n_orphans"), lit(0L)).as("n_orphans"))
        .withColumn("ok", (col("n_orphans") === 0).cast("int"))
    val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
    val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
    val su = t(s, dir, "supplier"); val p = t(s, dir, "part")
    val ev = t(s, dir, "events")
    Seq(
      edge("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
      edge("events.user_id->customer", ev, "user_id", c, "c_custkey"),
      edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
      edge("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
      edge("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
      edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
      edge("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"))
      .reduce(_.union(_))
      .orderBy(col("relationship"))
  }

  def dqExpectations(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Expectations._
    val orders = t(s, dir, "orders")
    val events = t(s, dir, "events")
    val ordersRep = evaluate("orders", orders, Seq(
        notNull("o_custkey"),
        between("o_totalprice", lit(0.0), lit(300000.0)),
        inSet("o_orderstatus", Seq("P", "O", "F")),
        inSet("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"))),
      uniqueCols = Seq("o_orderkey"))
    val eventsRep = evaluate("events", events,
      Seq(notNull("user_id")), uniqueCols = Seq("event_id"))
    val fkLine = fkOrphans("lineitem", t(s, dir, "lineitem"),
      "l_orderkey", orders, "o_orderkey")
    val fkEvents = fkOrphans("events", events, "user_id",
      t(s, dir, "customer"), "c_custkey")
    ordersRep.unionByName(eventsRep).unionByName(fkLine)
      .unionByName(fkEvents)
      .orderBy(col("tbl"), col("col"), col("expectation"))
  }

  // ------------------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_incremental" -> (aggIncremental _),
    "join_incremental" -> (joinIncremental _),
    "hll_incremental" -> (hllIncremental _),
    "hll_sliding" -> (hllSliding _),
    "hll_intersect" -> (hllIntersect _),
    "dq_expectations" -> (dqExpectations _),
    "ri_audit" -> (riAudit _),
    "event_transitions" -> (eventTransitions _),
    "skew_stats" -> (skewStats _),
    "length_deciles" -> (lengthDeciles _),
    "profile_table" -> (profileTable _),
    "profile_sketch" -> (profileSketch _),
    "forget_user" -> (forgetUser _),
    "k_anonymity" -> (kAnonymity _),
    "attribution" -> (attribution _),
    "topk_per_group" -> (topkPerGroup _),
    "table_diff" -> (tableDiff _),
    "stream_daily" -> (streamDailyCounts _),
    "stream_late" -> (streamLate _),
    "stream_dq" -> (streamDq _),
    "stream_enrich" -> (streamEnrich _),
    "stream_sessionize" -> (streamSessionize _),
    "stream_ema" -> (streamEma _),
    "stream_anomaly" -> (streamAnomaly _),
    "stream_join" -> (streamJoin _),
    "stream_outer_join" -> (streamOuterJoin _),
    "stream_dedup" -> (streamDedup _),
    "stream_cdc" -> (streamCdc _),
    "join_outer" -> (joinOuter _),
    "window_ranks" -> (windowRanks _),
    "sync_checksum" -> (syncChecksum _),
    "partition_manifest" -> (partitionManifest _),
    "stream_manifest" -> (streamManifest _),
    "manifest_diff" -> (manifestDiff _),
    "backfill_windows" -> (backfillWindows _),
    "compact_roundtrip" -> (compactRoundtrip _),
    "spatial_join" -> (spatialJoin _),
    "spatial_knn" -> (spatialKnn _),
    "spatial_clusters" -> (spatialClusters _),
    "format_roundtrip" -> (formatRoundtrip _),
    "merge_upsert" -> (mergeUpsert _),
    "gap_fill" -> (gapFill _),
    "fuzzy_join" -> (fuzzyJoin _),
    "entity_resolution" -> (entityResolution _),
    "bloom_prune" -> (bloomPrune _),
    "bloom_house" -> (bloomHouse _),
    "scd2_intervals" -> (scd2Intervals _),
    "scd2_asof" -> (scd2Asof _),
    "scd2_salted" -> (scd2Salted _),
    "pagerank" -> (pagerank _),
    "pagerank_delta" -> (pagerankDelta _),
    "hits_rank" -> (hitsRank _),
    "kcore" -> (kcore _),
    "bfs_hops" -> (bfsHopsQ _),
    "sssp_weighted" -> (ssspWeighted _),
    "bucketed_join" -> (bucketedJoin _),
    "label_prop" -> (labelProp _),
    "modularity" -> (modularity _),
    "topk_freq" -> (topkFreq _),
    "topk_freq_bound" -> (topkFreqBound _),
    "cms_freq" -> (cmsFreq _),
    "cms_join_est" -> (cmsJoinEst _),
    "assoc_rules" -> (assocRules _),
    "retention_cohorts" -> (retentionCohorts _),
    "funnel_ordered" -> (funnelOrdered _),
    "anomaly_events" -> (anomalyEvents _),
    "unpivot_events" -> (unpivotEvents _),
    "range_join" -> (rangeJoin _),
    "asof_join" -> (asofJoin _),
    "asof_nearest" -> (asofNearestQ _),
    "pivot_events" -> (pivotEvents _),
    "sample_deterministic" -> (sampleDeterministic _),
    "approx_distinct" -> (approxDistinct _),
    "approx_distinct_bound" -> (approxDistinctBound _),
    "skew_join" -> (skewJoin _),
    "sessionize" -> (sessionize _),
    "ema_smooth" -> (emaSmooth _),
    "holt_linear" -> (holtLinearQ _),
    "ema_anomaly" -> (emaAnomaly _),
    "forecast_backtest" -> (forecastBacktest _),
    "seasonality_strength" -> (seasonalityStrength _),
    "acf_daily" -> (acfDaily _),
    "trend_daily" -> (trendDaily _),
    "stream_seasonal" -> (streamSeasonal _),
    "stream_distinct" -> (streamDistinct _),
    "stream_quantile" -> (streamQuantile _),
    "stream_topk" -> (streamTopk _),
    "moving_sum_7d" -> (movingSum7d _),
    "interval_union" -> (intervalUnion _),
    "percentile_bound" -> (percentileBound _),
    "quantile_hist" -> (quantileHist _),
    "mad_outliers" -> (madOutliers _),
    "range_shard" -> (rangeShard _),
    "range_shard_delta" -> (rangeShardDelta _),
    "zorder_key" -> (zorderKey _),
    "hilbert_key" -> (hilbertKey _),
    "dpp_join" -> (dppJoin _))

  /** `pagerank_delta`'s replay: all FOUR e12 power-iteration
    * trajectories unrolled with the `pagerank` oracle's round shape —
    * old graph 3 rounds, warm 1 round seeded from or3, cold 1 round
    * from uniform, reference 6 rounds — then both L1 distances and
    * the warm_wins verdict in plain integer SQL.
    */
  private def pagerankDeltaOracleSql: String = {
    def rounds(pfx: String, eN: String, degN: String, nN: String,
               from: String, k: Int): String =
      (1 to k).map { i =>
        val prev = if (i == 1) from else s"${pfx}r${i - 1}"
        s"""${pfx}m$i AS (SELECT $eN.dst AS id,
                CAST(sum(r.r // r.deg) AS BIGINT) AS f
              FROM $prev r JOIN $eN ON r.id = $eN.src GROUP BY 1),
           ${pfx}r$i AS (SELECT d.id, d.deg,
                 150000000000 // $nN.n + (85 * coalesce(m.f, 0)) // 100 AS r
              FROM $degN d CROSS JOIN $nN
              LEFT JOIN ${pfx}m$i m ON d.id = m.id)"""
      }.mkString(",\n")
    s"""WITH f0 AS (SELECT DISTINCT o_custkey AS src,
                           1099511627776 + l_suppkey AS dst
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       b0 AS (SELECT DISTINCT o_custkey AS src,
                     1099511627776 + l_suppkey AS dst
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              WHERE l_orderkey % 7 <> 0),
       e AS (SELECT src, dst FROM f0 UNION SELECT dst, src FROM f0),
       eo AS (SELECT src, dst FROM b0 UNION SELECT dst, src FROM b0),
       deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY 1),
       dego AS (SELECT src AS id, count(*) AS deg FROM eo GROUP BY 1),
       n AS (SELECT count(*) AS n FROM deg),
       no AS (SELECT count(*) AS n FROM dego),
       or0 AS (SELECT id, deg, 1000000000000 // no.n AS r FROM dego, no),
       ${rounds("o", "eo", "dego", "no", "or0", 3)},
       wr0 AS (SELECT d.id, d.deg, coalesce(o.r, 1000000000000 // n.n) AS r
               FROM deg d CROSS JOIN n LEFT JOIN or3 o ON d.id = o.id),
       ${rounds("w", "e", "deg", "n", "wr0", 1)},
       cr0 AS (SELECT id, deg, 1000000000000 // n.n AS r FROM deg, n),
       ${rounds("c", "e", "deg", "n", "cr0", 1)},
       rr0 AS (SELECT id, deg, 1000000000000 // n.n AS r FROM deg, n),
       ${rounds("f", "e", "deg", "n", "rr0", 6)},
       lw AS (SELECT CAST(sum(abs(w.r - f.r)) AS BIGINT) AS l1w
              FROM wr1 w JOIN fr6 f ON w.id = f.id),
       lc AS (SELECT CAST(sum(abs(c.r - f.r)) AS BIGINT) AS l1c
              FROM cr1 c JOIN fr6 f ON c.id = f.id)
       SELECT n.n AS n_nodes, lw.l1w AS l1_warm_e12,
              lc.l1c AS l1_cold_e12,
              CAST(lw.l1w < lc.l1c AS INTEGER) AS warm_wins
       FROM n CROSS JOIN lw CROSS JOIN lc"""
  }

  /** `cms_join_est`'s replay: per-(row, side) bucket assignment via
    * the shuffle_key SplitMix64 chain in UBIGINT split-multiply SQL
    * (the shard_assign template; salts mix64(97+r) as literals),
    * cell counts, per-row inner products, the row-min estimate, and
    * the exact per-key truth.
    */
  private def cmsJoinEstOracleSql: String = {
    val salts = (0 until 4).map { r =>
      s"($r, ${java.lang.Long.toUnsignedString(
        graft.functions.Kernels.mix64(97L + r))}::UBIGINT)"
    }.mkString(", ")
    s"""WITH e AS (SELECT user_id, event_id % 2 = 0 AS a FROM events),
       sc AS (SELECT user_id, a, s.r,
                xor(CAST(user_id AS UBIGINT), s.salt) AS u
              FROM e CROSS JOIN (VALUES $salts) AS s(r, salt)),
       m1 AS (SELECT user_id, a, r,
                CAST((CAST(u AS HUGEINT) + 11400714819323198485)
                     % 18446744073709551616 AS UBIGINT) AS z1 FROM sc),
       m2 AS (SELECT user_id, a, r,
                CAST(((CAST(xor(z1, z1 >> 30) % 4294967296 AS HUGEINT) * 13787848793156543929) + (((CAST(xor(z1, z1 >> 30) // 4294967296 AS HUGEINT) * 484763065) % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z2 FROM m1),
       m3 AS (SELECT user_id, a, r,
                CAST(((CAST(xor(z2, z2 >> 27) % 4294967296 AS HUGEINT) * 10723151780598845931) + (((CAST(xor(z2, z2 >> 27) // 4294967296 AS HUGEINT) * 321982955) % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z3 FROM m2),
       bk AS (SELECT user_id, a, r,
                CAST((xor(z3, z3 >> 31) >> 32) % 16 AS INTEGER) AS b
              FROM m3),
       cells AS (SELECT a, r, b, count(*) AS c FROM bk GROUP BY 1, 2, 3),
       ip AS (SELECT ca.r, CAST(sum(ca.c * cb.c) AS BIGINT) AS ip
              FROM cells ca JOIN cells cb
                ON ca.r = cb.r AND ca.b = cb.b AND ca.a AND NOT cb.a
              GROUP BY ca.r),
       est AS (SELECT min(ip) AS est_join FROM ip),
       kc AS (SELECT user_id,
                sum(CASE WHEN a THEN 1 ELSE 0 END) AS ka,
                sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS kb
              FROM e GROUP BY user_id),
       tr AS (SELECT CAST(sum(ka * kb) AS BIGINT) AS true_join,
                     CAST(sum(ka) AS BIGINT) AS n_a,
                     CAST(sum(kb) AS BIGINT) AS n_b
              FROM kc)
       SELECT tr.n_a, tr.n_b, tr.true_join,
              CAST(est.est_join AS BIGINT) AS est_join,
              CAST(est.est_join - tr.true_join AS BIGINT) AS over_join
       FROM tr CROSS JOIN est"""
  }

  /** `hilbert_key`'s replay: the order-16 xy2d walk unrolled into 16
    * chained CTEs. Each level s = 2^b updates (x, y, d) with the
    * SAME integer arithmetic as [[graft.functions.Kernels.hilbert2]]:
    * d += s²·((3·rx) xor ry), then the ry=0 rotation (flip by
    * 65535−· when rx=1, swap x/y) — all expressions reference the
    * PREVIOUS CTE's columns, so aliasing is unambiguous.
    */
  private def hilbertOracleSql: String = {
    val steps = (15 to 0 by -1).zipWithIndex.map { case (b, k) =>
      val s = 1L << b
      s"""h${k + 1} AS (SELECT l_orderkey, l_linenumber,
            CASE WHEN (y & $s) = 0
                 THEN CASE WHEN (x & $s) > 0 THEN 65535 - y ELSE y END
                 ELSE x END AS x,
            CASE WHEN (y & $s) = 0
                 THEN CASE WHEN (x & $s) > 0 THEN 65535 - x ELSE x END
                 ELSE y END AS y,
            d + $s * $s *
              xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
                  CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) AS d
          FROM h$k)"""
    }
    s"""WITH h0 AS (SELECT l_orderkey, l_linenumber,
          CAST(l_partkey % 65536 AS BIGINT) AS x,
          CAST(l_suppkey % 65536 AS BIGINT) AS y,
          CAST(0 AS BIGINT) AS d
        FROM lineitem),
       ${steps.mkString(",\n       ")}
       SELECT l_orderkey, l_linenumber, d AS hkey
       FROM h16 ORDER BY hkey, l_orderkey, l_linenumber"""
  }

  /** ema_smooth / stream_ema shared replay: the truncating int64
    * recurrence unrolled as a RECURSIVE CTE joining step rn to rn+1.
    */
  private val emaOracleSql: String =
    """WITH RECURSIVE s AS (
         SELECT user_id, event_id, epoch_us(ts) AS us,
                CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v_e6
         FROM events),
       r0 AS (SELECT user_id, event_id, v_e6,
                CAST(row_number() OVER (PARTITION BY user_id
                  ORDER BY us, event_id) AS BIGINT) AS rn
              FROM s),
       ema AS (
         SELECT user_id, rn, event_id, v_e6, v_e6 AS ema_e6
         FROM r0 WHERE rn = 1
         UNION ALL
         SELECT n.user_id, n.rn, n.event_id, n.v_e6,
                (1 * n.v_e6 + 3 * e.ema_e6) // 4
         FROM ema e JOIN r0 n
           ON n.user_id = e.user_id AND n.rn = e.rn + 1)
       SELECT user_id, rn, event_id, v_e6, ema_e6 FROM ema
       ORDER BY user_id, rn"""

  /** holt_linear replay: the TWO-state recurrence unrolled; the new
    * level feeds the same row's trend update, so the level expression
    * is repeated inline (a recursive branch cannot reference its own
    * aliases). `//` trunc = Scala int64 `/` on ALL signs — verified,
    * and the trend genuinely goes negative on falling series.
    */
  private val holtOracleSql: String =
    """WITH RECURSIVE s AS (
         SELECT user_id, event_id, epoch_us(ts) AS us,
                CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v_e6
         FROM events),
       r0 AS (SELECT user_id, event_id, v_e6,
                CAST(row_number() OVER (PARTITION BY user_id
                  ORDER BY us, event_id) AS BIGINT) AS rn
              FROM s),
       h AS (
         SELECT user_id, rn, event_id, v_e6,
                v_e6 AS level_e6, CAST(0 AS BIGINT) AS trend_e6
         FROM r0 WHERE rn = 1
         UNION ALL
         SELECT n.user_id, n.rn, n.event_id, n.v_e6,
                (1 * n.v_e6 + 3 * (h.level_e6 + h.trend_e6)) // 4,
                (1 * ((1 * n.v_e6 + 3 * (h.level_e6 + h.trend_e6)) // 4
                      - h.level_e6)
                 + 7 * h.trend_e6) // 8
         FROM h JOIN r0 n
           ON n.user_id = h.user_id AND n.rn = h.rn + 1)
       SELECT user_id, rn, event_id, v_e6, level_e6, trend_e6,
              level_e6 + trend_e6 AS fc_e6
       FROM h ORDER BY user_id, rn"""

  /** ema_anomaly / stream_anomaly shared replay: (ema, dev) state plus
    * the causal flag — the flag tests the CURRENT row against the
    * PRIOR state (n.rn > warmup, cross-multiplied k = 5/2, floor
    * 0.5e6), then both states update. No division enters the flag.
    */
  private val anomalyOracleSql: String =
    """WITH RECURSIVE s AS (
         SELECT user_id, event_id, epoch_us(ts) AS us,
                CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v_e6
         FROM events),
       r0 AS (SELECT user_id, event_id, v_e6,
                CAST(row_number() OVER (PARTITION BY user_id
                  ORDER BY us, event_id) AS BIGINT) AS rn
              FROM s),
       a AS (
         SELECT user_id, rn, event_id, v_e6,
                v_e6 AS ema_e6, CAST(0 AS BIGINT) AS dev_e6,
                0 AS is_anom
         FROM r0 WHERE rn = 1
         UNION ALL
         SELECT n.user_id, n.rn, n.event_id, n.v_e6,
                (1 * n.v_e6 + 3 * a.ema_e6) // 4,
                (1 * abs(n.v_e6 - a.ema_e6) + 3 * a.dev_e6) // 4,
                CASE WHEN n.rn > 3
                      AND 2 * abs(n.v_e6 - a.ema_e6)
                          > 5 * a.dev_e6 + 2 * 500000
                     THEN 1 ELSE 0 END
         FROM a JOIN r0 n
           ON n.user_id = a.user_id AND n.rn = a.rn + 1)
       SELECT user_id, rn, event_id, v_e6, ema_e6, dev_e6, is_anom
       FROM a ORDER BY user_id, rn"""

  /** The spatial point chain shared by the spatial_join / spatial_knn
    * oracles: both coordinates' SplitMix64 chains in UBIGINT
    * split-multiply SQL, signed reinterpretation, floorMod to the
    * 100k grid.
    */
  /** One-pass house-HLL replay ([[graft.ops.Hll]]) over a caller-
    * supplied CTE `pr` with columns (g, k): the mix64 chain in
    * UBIGINT split-multiply SQL, integer ρ = bit_count(w ⊕ (w−1)),
    * max registers, the exact HUGEINT Z-sum, rational α_m, and the
    * linear-counting branch. Yields CTE `ee` with (g, est) — shared
    * by the `approx_distinct` and `hll_incremental` oracles.
    */
  /** The range_shard replay — ONE definition shared by `range_shard`
    * and `range_shard_delta` (cells merge by addition, so the
    * incrementally maintained shard map is bit-identical to the
    * one-pass computation and shares this oracle verbatim).
    */
  private val rangeShardOracleSql: String =
    """WITH r AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                    AS BIGINT) AS cents,
                  CAST(floor(CAST(floor(o_totalprice * 100 + 0.5)
                    AS BIGINT) / 16384.0) AS BIGINT) AS bin
             FROM orders),
       h AS (SELECT bin, count(*) AS c FROM r GROUP BY 1),
       cc AS (SELECT bin, c,
                sum(c) OVER (ORDER BY bin) AS cum,
                sum(c) OVER () AS n
              FROM h),
       bnd AS (SELECT j, min(bin) AS b
               FROM cc CROSS JOIN range(1, 8) t(j)
               WHERE cum >= (j * n + 7) // 8
               GROUP BY j)
       SELECT shard_id, count(*) AS n_rows,
              min(cents) AS min_cents, max(cents) AS max_cents
       FROM (SELECT r.cents,
               CAST((SELECT count(*) FROM bnd WHERE bnd.b <= r.bin)
                 AS INTEGER) AS shard_id
             FROM r)
       GROUP BY shard_id ORDER BY shard_id"""

  /** The four stacked int64 column views of `events` shared by the
    * profile_sketch oracle's HLL arm and its quantile-histogram arm —
    * one definition so the two arms cannot drift.
    */
  private val profileStackSql: String =
    "SELECT 'user_id' AS col_name, user_id AS k FROM events " +
      "UNION ALL SELECT 'event_id', event_id FROM events " +
      "UNION ALL SELECT 'day', " +
      "CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) " +
      "AS BIGINT) FROM events " +
      "UNION ALL SELECT 'value_e4', " +
      "CAST(floor(value * 10000 + 0.5) AS BIGINT) FROM events"

  private def hllChainSql(prCte: String, salt: Long): String = {
    val saltMix = java.lang.Long.toUnsignedString(
      graft.functions.Kernels.mix64(salt))
    s"""WITH pr AS ($prCte),
         hsc AS (SELECT g,
                  xor(CAST(k AS UBIGINT), $saltMix::UBIGINT) AS u
                FROM pr),
         hm1 AS (SELECT g,
                  CAST((CAST(u AS HUGEINT) + 11400714819323198485)
                       % 18446744073709551616 AS UBIGINT) AS z1 FROM hsc),
         hm2 AS (SELECT g,
                  CAST(((CAST(xor(z1, z1 >> 30) % 4294967296 AS HUGEINT)
                         * 13787848793156543929)
                        + (((CAST(xor(z1, z1 >> 30) // 4294967296
                               AS HUGEINT)
                             * 484763065) % 4294967296) * 4294967296))
                       % 18446744073709551616 AS UBIGINT) AS z2 FROM hm1),
         hm3 AS (SELECT g,
                  CAST(((CAST(xor(z2, z2 >> 27) % 4294967296 AS HUGEINT)
                         * 10723151780598845931)
                        + (((CAST(xor(z2, z2 >> 27) // 4294967296
                               AS HUGEINT)
                             * 321982955) % 4294967296) * 4294967296))
                       % 18446744073709551616 AS UBIGINT) AS z3 FROM hm2),
         hh AS (SELECT g, xor(z3, z3 >> 31) AS hv FROM hm3),
         bw AS (SELECT g, CAST(hv & 1023 AS BIGINT) AS bucket,
                  hv >> 10 AS w FROM hh),
         rh AS (SELECT g, bucket,
                  CASE WHEN w = 0 THEN 55
                       ELSE CAST(bit_count(xor(w, w - 1)) AS INTEGER)
                  END AS rho
                FROM bw),
         regs AS (SELECT g, bucket, max(rho) AS r
                  FROM rh GROUP BY 1, 2),
         st AS (SELECT g, count(*) AS nz,
                  sum(CAST(1::UBIGINT << (55 - r) AS HUGEINT)) AS s_nz
                FROM regs GROUP BY 1),
         ed AS (SELECT g, 1024 - nz AS v,
                  CAST(s_nz + (1024 - nz)
                         * 36028797018963968::HUGEINT AS DOUBLE) AS sd
                FROM st),
         er AS (SELECT g, v,
                  279039421980170247588980719616::DOUBLE
                    / (10250790.0 * sd) AS est_raw FROM ed),
         ee AS (SELECT g,
                  CASE WHEN v > 0 AND est_raw <= 2560.0
                       THEN 1024.0 * ln(1024.0 / CAST(v AS DOUBLE))
                       ELSE est_raw END AS est
                FROM er)"""
  }

  /** The house-HLL distinct-users replay shared by `approx_distinct`
    * (batch) and `stream_distinct` (streamed register store — the
    * max-merge is bit-equal to one pass, so both shapes answer to
    * this one chain).
    */
  private lazy val approxDistinctOracleSql: String = hllChainSql(
    "SELECT DISTINCT event_type AS g, user_id AS k FROM events",
    salt = 777000L) + """,
         ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
                FROM events GROUP BY 1)
         SELECT ee.g AS event_type,
                CAST(floor(est + 0.5) AS BIGINT) AS approx_users,
                exact_users
         FROM ee JOIN ex ON ee.g = ex.event_type
         ORDER BY event_type"""

  private val spatialPtChainSql: String = {
    def add(u: String) =
      s"CAST((CAST($u AS HUGEINT) + 11400714819323198485) " +
        s"% 18446744073709551616 AS UBIGINT)"
    def mul(z: String, sh: Int, c: String, cLo: String) =
      s"CAST(((CAST(xor($z, $z >> $sh) % 4294967296 AS HUGEINT) * $c) " +
        s"+ (((CAST(xor($z, $z >> $sh) // 4294967296 AS HUGEINT) " +
        s"* $cLo) % 4294967296) * 4294967296)) " +
        s"% 18446744073709551616 AS UBIGINT)"
    def fin(z: String) =
      s"CAST(xor($z, $z >> 31) AS HUGEINT) " +
        s"- CASE WHEN xor($z, $z >> 31) >= 9223372036854775808::UBIGINT " +
        s"THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END"
    val s1 = java.lang.Long.toUnsignedString(
      graft.functions.Kernels.mix64(1L))
    val s2 = java.lang.Long.toUnsignedString(
      graft.functions.Kernels.mix64(2L))
    val c2 = "13787848793156543929"; val c2lo = "484763065"
    val c3 = "10723151780598845931"; val c3lo = "321982955"
    s"""WITH sc AS (SELECT c_custkey AS id,
                  xor(CAST(c_custkey AS UBIGINT), $s1::UBIGINT) AS u1,
                  xor(CAST(c_custkey AS UBIGINT), $s2::UBIGINT) AS u2
                FROM customer),
       m1 AS (SELECT id, ${add("u1")} AS z11, ${add("u2")} AS z12
              FROM sc),
       m2 AS (SELECT id, ${mul("z11", 30, c2, c2lo)} AS z21,
                         ${mul("z12", 30, c2, c2lo)} AS z22
              FROM m1),
       m3 AS (SELECT id, ${mul("z21", 27, c3, c3lo)} AS z31,
                         ${mul("z22", 27, c3, c3lo)} AS z32
              FROM m2),
       pt AS MATERIALIZED (SELECT id,
                CAST(((${fin("z31")}) % 100000 + 100000) % 100000
                     AS BIGINT) AS x,
                CAST(((${fin("z32")}) % 100000 + 100000) % 100000
                     AS BIGINT) AS y
              FROM m3)"""
  }

  /** The manifest replay shared by `partition_manifest` and
    * `stream_manifest` (the streamed final state must equal the
    * batch recompute): the digest's mix64 chain in UBIGINT
    * split-multiply SQL, signed reinterpretation, the day-grouped
    * exact HUGEINT sums wrapped mod 2⁶⁴ and reinterpreted signed —
    * the emitted digest is a plain BIGINT on both sides (round-9
    * house rule: emitted cells stay within int64; the exact sum
    * ranges over ±2×10²⁰ and is un-hashable by the driver gate).
    */
  /** The per-day manifest CTE chain over a named (day, event_id)
    * relation `src`, all CTEs prefixed `p` — produces `${p}grp` with
    * (day, n_rows, min_id, max_id, digest) where digest is the
    * wrapped signed-int64 sum (the engine's
    * [[graft.ops.Manifest.wrapSigned64]] twin). Parameterized so
    * `manifest_diff` can run the SAME chain over both sides of a
    * reconciliation.
    */
  private def manifestChainSql(src: String, p: String): String = {
      val salt = java.lang.Long.toUnsignedString(
        graft.functions.Kernels.mix64(424242L))
      s"""${p}sc AS (SELECT day, event_id,
                  xor(CAST(event_id AS UBIGINT), $salt::UBIGINT) AS u
                FROM $src),
       ${p}m1 AS (SELECT day, event_id,
                CAST((CAST(u AS HUGEINT) + 11400714819323198485)
                     % 18446744073709551616 AS UBIGINT) AS z1 FROM ${p}sc),
       ${p}m2 AS (SELECT day, event_id,
                CAST(((CAST(xor(z1, z1 >> 30) % 4294967296 AS HUGEINT)
                       * 13787848793156543929)
                      + (((CAST(xor(z1, z1 >> 30) // 4294967296 AS HUGEINT)
                           * 484763065) % 4294967296) * 4294967296))
                     % 18446744073709551616 AS UBIGINT) AS z2 FROM ${p}m1),
       ${p}m3 AS (SELECT day, event_id,
                CAST(((CAST(xor(z2, z2 >> 27) % 4294967296 AS HUGEINT)
                       * 10723151780598845931)
                      + (((CAST(xor(z2, z2 >> 27) // 4294967296 AS HUGEINT)
                           * 321982955) % 4294967296) * 4294967296))
                     % 18446744073709551616 AS UBIGINT) AS z3 FROM ${p}m2),
       ${p}h AS (SELECT day, event_id, xor(z3, z3 >> 31) AS hv FROM ${p}m3),
       ${p}sg AS (SELECT day, event_id,
                CAST(hv AS HUGEINT)
                  - CASE WHEN hv >= 9223372036854775808::UBIGINT
                         THEN 18446744073709551616::HUGEINT
                         ELSE 0::HUGEINT END AS sh
              FROM ${p}h),
       ${p}grp AS (SELECT day, count(*) AS n_rows, min(event_id) AS min_id,
                 max(event_id) AS max_id,
                 CAST(((sum(sh) % 18446744073709551616::HUGEINT)
                        + 18446744073709551616::HUGEINT)
                       % 18446744073709551616::HUGEINT
                      - CASE WHEN ((sum(sh) % 18446744073709551616::HUGEINT)
                                    + 18446744073709551616::HUGEINT)
                                   % 18446744073709551616::HUGEINT
                                   >= 9223372036854775808::HUGEINT
                             THEN 18446744073709551616::HUGEINT
                             ELSE 0::HUGEINT END AS BIGINT) AS digest
               FROM ${p}sg GROUP BY day)"""
    }

  private val manifestOracleSql: String =
    s"""WITH esrc AS (SELECT CAST(ts AS DATE) AS day, event_id
                      FROM events),
       ${manifestChainSql("esrc", "")}
       SELECT day, n_rows, min_id, max_id, digest
       FROM grp ORDER BY day"""

  /** The diff WITH-body (through the `diff` CTE) shared by
    * `manifest_diff` and `backfill_windows`.
    */
  private val manifestDiffCoreSql: String =
    s"""WITH d0v AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
       asrc AS (SELECT CAST(ts AS DATE) AS day, event_id FROM events),
       dropid AS (SELECT min(event_id) AS x FROM asrc, d0v
                  WHERE day = d0 + 10),
       minsub AS (SELECT min(event_id) AS m0 FROM asrc, d0v
                  WHERE day = d0 + 17),
       subid AS (SELECT min(event_id) AS x FROM asrc, d0v, minsub
                 WHERE day = d0 + 17 AND event_id > m0),
       bsrc AS (SELECT day,
                  CASE WHEN day = (SELECT d0 FROM d0v) + 17
                        AND event_id = (SELECT x FROM subid)
                       THEN event_id + 1 ELSE event_id END AS event_id
                FROM asrc
                WHERE day <> (SELECT d0 FROM d0v) + 3
                  AND NOT (day = (SELECT d0 FROM d0v) + 10
                           AND event_id = (SELECT x FROM dropid))),
       ${manifestChainSql("asrc", "a_")},
       ${manifestChainSql("bsrc", "b_")},
       diff AS (SELECT coalesce(a_grp.day, b_grp.day) AS day,
              coalesce(a_grp.n_rows, 0) AS n_a,
              coalesce(b_grp.n_rows, 0) AS n_b,
              CASE WHEN b_grp.day IS NULL THEN 'missing'
                   WHEN a_grp.day IS NULL THEN 'extra'
                   WHEN a_grp.n_rows <> b_grp.n_rows
                     OR a_grp.min_id <> b_grp.min_id
                     OR a_grp.max_id <> b_grp.max_id THEN 'count_drift'
                   WHEN a_grp.digest <> b_grp.digest THEN 'content_drift'
                   ELSE 'match' END AS status
       FROM a_grp FULL OUTER JOIN b_grp ON a_grp.day = b_grp.day)"""

  private val manifestDiffOracleSql: String =
    manifestDiffCoreSql +
      " SELECT day, n_a, n_b, status FROM diff ORDER BY day"

  private val backfillWindowsOracleSql: String =
    manifestDiffCoreSql + """,
       bad AS (SELECT day FROM diff WHERE status <> 'match'),
       r AS (SELECT day, row_number() OVER (ORDER BY day) AS rn FROM bad),
       g AS (SELECT day, day - CAST(rn AS INTEGER) AS grp FROM r)
       SELECT min(day) AS from_day, max(day) AS to_day,
              count(*) AS n_days
       FROM g GROUP BY grp ORDER BY from_day"""

  /** Shared replay for `seasonality_strength` and its streamed
    * deployment `stream_seasonal`: daily counts joined to their own
    * day-7/day-1 predecessors by DATE arithmetic; both error sums
    * over the both-present day set.
    */
  private val seasonalityOracleSql: String =
    """WITH daily AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
                               count(*) AS n
                        FROM events GROUP BY 1, 2),
         j AS (SELECT d.et, d.day, d.n, p1.n AS n1, p7.n AS n7
               FROM daily d
               JOIN daily p1 ON p1.et = d.et AND p1.day = d.day - 1
               JOIN daily p7 ON p7.et = d.et AND p7.day = d.day - 7),
         g AS (SELECT et AS event_type, count(*) AS n_days,
                      sum(abs(n - n1)) AS sae1,
                      sum(abs(n - n7)) AS sae7
               FROM j GROUP BY 1)
         SELECT event_type, n_days, CAST(sae1 AS BIGINT) AS sae1,
                CAST(sae7 AS BIGINT) AS sae7,
                CAST(CASE WHEN sae1 = 0 THEN 1000000
                          ELSE (sae7 * 1000000) // sae1 END AS BIGINT)
                  AS ratio_e6,
                CAST(CASE WHEN sae7 < sae1 THEN 1 ELSE 0 END AS INTEGER)
                  AS seasonal
         FROM g ORDER BY event_type"""

  val oracle: Map[String, String] = Map(
    // two HITS iterations unrolled: per round an edge⋈score join +
    // per-endpoint sum, then the max-norm truncating renormalization
    // (sums are HUGEINT in DuckDB, BIGINT in the engine — same values,
    // cast at the end)
    "hits_rank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                            1099511627776 + l_suppkey AS dst
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         h0 AS (SELECT DISTINCT src AS id, CAST(1000000 AS BIGINT) AS s
                FROM e0),
         a1r AS (SELECT dst AS id, sum(h0.s) AS raw
                 FROM e0 JOIN h0 ON e0.src = h0.id GROUP BY dst),
         a1 AS (SELECT id, (raw * 1000000) // (SELECT max(raw) FROM a1r)
                     AS s FROM a1r),
         h1r AS (SELECT src AS id, sum(a1.s) AS raw
                 FROM e0 JOIN a1 ON e0.dst = a1.id GROUP BY src),
         h1 AS (SELECT id, (raw * 1000000) // (SELECT max(raw) FROM h1r)
                     AS s FROM h1r),
         a2r AS (SELECT dst AS id, sum(h1.s) AS raw
                 FROM e0 JOIN h1 ON e0.src = h1.id GROUP BY dst),
         a2 AS (SELECT id, (raw * 1000000) // (SELECT max(raw) FROM a2r)
                     AS s FROM a2r),
         h2r AS (SELECT src AS id, sum(a2.s) AS raw
                 FROM e0 JOIN a2 ON e0.dst = a2.id GROUP BY src),
         h2 AS (SELECT id, (raw * 1000000) // (SELECT max(raw) FROM h2r)
                     AS s FROM h2r)
         SELECT id, side, CAST(s AS BIGINT) AS score_e6 FROM (
           SELECT id, 'hub' AS side, s FROM h2
           UNION ALL SELECT id, 'auth' AS side, s FROM a2)
         ORDER BY side, id""",
    // the 3 synchronous LPA rounds unrolled: per round one
    // neighbor-label join, a frequency count, and a row_number argmax
    // (count DESC, label ASC) — the full trajectory replayed
    // the same unrolled 3-round LPA chain as label_prop, then Q's
    // numerator/denominator as exact integers (no division — the
    // trunc-vs-floor divergence never arises)
    "modularity" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                            1099511627776 + l_suppkey AS dst
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
               FROM e0
               UNION SELECT dst, src FROM e0),
         l0 AS (SELECT DISTINCT src AS id, src AS lab FROM e),
         l1 AS (SELECT id, lab FROM (
                  SELECT e.src AS id, l.lab, count(*) AS c,
                         row_number() OVER (PARTITION BY e.src
                           ORDER BY count(*) DESC, l.lab ASC) AS rn
                  FROM e JOIN l0 l ON e.dst = l.id
                  GROUP BY e.src, l.lab) WHERE rn = 1),
         l2 AS (SELECT id, lab FROM (
                  SELECT e.src AS id, l.lab, count(*) AS c,
                         row_number() OVER (PARTITION BY e.src
                           ORDER BY count(*) DESC, l.lab ASC) AS rn
                  FROM e JOIN l1 l ON e.dst = l.id
                  GROUP BY e.src, l.lab) WHERE rn = 1),
         l3 AS (SELECT id, lab FROM (
                  SELECT e.src AS id, l.lab, count(*) AS c,
                         row_number() OVER (PARTITION BY e.src
                           ORDER BY count(*) DESC, l.lab ASC) AS rn
                  FROM e JOIN l2 l ON e.dst = l.id
                  GROUP BY e.src, l.lab) WHERE rn = 1),
         pairs AS (SELECT CAST(src AS BIGINT) AS src,
                          CAST(dst AS BIGINT) AS dst FROM e0),
         m AS (SELECT count(*)::BIGINT AS m FROM pairs),
         wl AS (SELECT p.src, p.dst, la.lab AS lab_s, lb.lab AS lab_d
                FROM pairs p JOIN l3 la ON p.src = la.id
                             JOIN l3 lb ON p.dst = lb.id),
         ec AS (SELECT lab_s AS lab, count(*)::BIGINT AS e_c
                FROM wl WHERE lab_s = lab_d GROUP BY 1),
         deg AS (SELECT id, count(*)::BIGINT AS d FROM (
                   SELECT src AS id FROM pairs
                   UNION ALL SELECT dst FROM pairs)
                 GROUP BY id),
         dc AS (SELECT l.lab, CAST(sum(deg.d) AS BIGINT) AS d_c
                FROM deg JOIN l3 l ON deg.id = l.id GROUP BY 1),
         s AS (SELECT CAST(sum(coalesce(ec.e_c, 0)) AS BIGINT) AS sum_ec,
                      CAST(sum(dc.d_c * dc.d_c) AS BIGINT) AS sum_dc2,
                      count(*)::BIGINT AS n_communities
               FROM dc LEFT JOIN ec ON dc.lab = ec.lab)
         SELECT m.m AS m_edges, s.n_communities,
                CAST(4 * m.m * s.sum_ec - s.sum_dc2 AS BIGINT) AS q_num,
                CAST(4 * m.m * m.m AS BIGINT) AS q_den
         FROM s CROSS JOIN m""",
    "label_prop" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                            1099511627776 + l_suppkey AS dst
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
               FROM e0
               UNION SELECT dst, src FROM e0),
         l0 AS (SELECT DISTINCT src AS id, src AS lab FROM e),
         l1 AS (SELECT id, lab FROM (
                  SELECT e.src AS id, l.lab, count(*) AS c,
                         row_number() OVER (PARTITION BY e.src
                           ORDER BY count(*) DESC, l.lab ASC) AS rn
                  FROM e JOIN l0 l ON e.dst = l.id
                  GROUP BY e.src, l.lab) WHERE rn = 1),
         l2 AS (SELECT id, lab FROM (
                  SELECT e.src AS id, l.lab, count(*) AS c,
                         row_number() OVER (PARTITION BY e.src
                           ORDER BY count(*) DESC, l.lab ASC) AS rn
                  FROM e JOIN l1 l ON e.dst = l.id
                  GROUP BY e.src, l.lab) WHERE rn = 1),
         l3 AS (SELECT id, lab FROM (
                  SELECT e.src AS id, l.lab, count(*) AS c,
                         row_number() OVER (PARTITION BY e.src
                           ORDER BY count(*) DESC, l.lab ASC) AS rn
                  FROM e JOIN l2 l ON e.dst = l.id
                  GROUP BY e.src, l.lab) WHERE rn = 1)
         SELECT id, lab FROM l3 ORDER BY id""",
    "bfs_hops" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                            1099511627776 + l_suppkey AS dst
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         h0 AS (SELECT DISTINCT CAST(src AS BIGINT) AS id FROM e0
                WHERE src % 199 = 0),
         h1 AS (SELECT DISTINCT e.dst AS id FROM e JOIN h0 ON e.src = h0.id
                WHERE e.dst NOT IN (SELECT id FROM h0)),
         h2 AS (SELECT DISTINCT e.dst AS id FROM e JOIN h1 ON e.src = h1.id
                WHERE e.dst NOT IN (SELECT id FROM h0
                                    UNION ALL SELECT id FROM h1)),
         h3 AS (SELECT DISTINCT e.dst AS id FROM e JOIN h2 ON e.src = h2.id
                WHERE e.dst NOT IN (SELECT id FROM h0
                                    UNION ALL SELECT id FROM h1
                                    UNION ALL SELECT id FROM h2))
         SELECT id, hop FROM (
           SELECT id, 0 AS hop FROM h0
           UNION ALL SELECT id, 1 FROM h1
           UNION ALL SELECT id, 2 FROM h2
           UNION ALL SELECT id, 3 FROM h3)
         ORDER BY id""",
    // the bucketed catalog tables must be result-invariant vs the raw
    // parquet join — the oracle is the plain join/agg over the
    // unbucketed sources
    "bucketed_join" ->
      """SELECT c_nationkey,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    // the 3 Bellman–Ford relaxation rounds unrolled: per round one
    // src equi-join + UNION ALL with the previous table + a min
    // aggregate — dist after round r = exact min-weight ≤r-edge path
    "sssp_weighted" ->
      """WITH ge AS (SELECT o_custkey AS src,
                            1099511627776 + l_suppkey AS dst,
                            CAST(count(*) AS BIGINT) AS w
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                     GROUP BY 1, 2),
         e AS (SELECT src, dst, w FROM ge
               UNION ALL SELECT dst, src, w FROM ge),
         d0 AS (SELECT DISTINCT CAST(src AS BIGINT) AS id,
                       CAST(0 AS BIGINT) AS dist
                FROM ge WHERE src % 199 = 0),
         d1 AS (SELECT id, min(dist) AS dist FROM (
                  SELECT id, dist FROM d0
                  UNION ALL
                  SELECT e.dst, d.dist + e.w
                  FROM d0 d JOIN e ON d.id = e.src) u GROUP BY id),
         d2 AS (SELECT id, min(dist) AS dist FROM (
                  SELECT id, dist FROM d1
                  UNION ALL
                  SELECT e.dst, d.dist + e.w
                  FROM d1 d JOIN e ON d.id = e.src) u GROUP BY id),
         d3 AS (SELECT id, min(dist) AS dist FROM (
                  SELECT id, dist FROM d2
                  UNION ALL
                  SELECT e.dst, d.dist + e.w
                  FROM d2 d JOIN e ON d.id = e.src) u GROUP BY id)
         SELECT id, CAST(dist AS BIGINT) AS dist FROM d3 ORDER BY id""",
    // every edge recomputed as an independent NOT-IN count; the ok
    // column states the zero-orphan invariant (forget_user pattern)
    "ri_audit" ->
      """SELECT 'customer.c_nationkey->nation' AS relationship,
           (SELECT count(*) FROM customer)::BIGINT AS n_child,
           (SELECT count(*) FROM customer WHERE c_nationkey NOT IN
             (SELECT n_nationkey FROM nation))::BIGINT AS n_orphans,
           CAST((SELECT count(*) FROM customer WHERE c_nationkey NOT IN
             (SELECT n_nationkey FROM nation)) = 0 AS INTEGER) AS ok
         UNION ALL SELECT 'events.user_id->customer',
           (SELECT count(*) FROM events)::BIGINT,
           (SELECT count(*) FROM events WHERE user_id NOT IN
             (SELECT c_custkey FROM customer))::BIGINT,
           CAST((SELECT count(*) FROM events WHERE user_id NOT IN
             (SELECT c_custkey FROM customer)) = 0 AS INTEGER)
         UNION ALL SELECT 'lineitem.l_orderkey->orders',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
             (SELECT o_orderkey FROM orders))::BIGINT,
           CAST((SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
             (SELECT o_orderkey FROM orders)) = 0 AS INTEGER)
         UNION ALL SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
             (SELECT p_partkey FROM part))::BIGINT,
           CAST((SELECT count(*) FROM lineitem WHERE l_partkey NOT IN
             (SELECT p_partkey FROM part)) = 0 AS INTEGER)
         UNION ALL SELECT 'lineitem.l_suppkey->supplier',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier))::BIGINT,
           CAST((SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier)) = 0 AS INTEGER)
         UNION ALL SELECT 'orders.o_custkey->customer',
           (SELECT count(*) FROM orders)::BIGINT,
           (SELECT count(*) FROM orders WHERE o_custkey NOT IN
             (SELECT c_custkey FROM customer))::BIGINT,
           CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN
             (SELECT c_custkey FROM customer)) = 0 AS INTEGER)
         UNION ALL SELECT 'supplier.s_nationkey->nation',
           (SELECT count(*) FROM supplier)::BIGINT,
           (SELECT count(*) FROM supplier WHERE s_nationkey NOT IN
             (SELECT n_nationkey FROM nation))::BIGINT,
           CAST((SELECT count(*) FROM supplier WHERE s_nationkey NOT IN
             (SELECT n_nationkey FROM nation)) = 0 AS INTEGER)
         ORDER BY relationship""",
    "dq_expectations" ->
      """WITH rep AS (
           SELECT 'orders' AS tbl, 'o_custkey' AS col,
                  'not_null' AS expectation,
                  count(*) FILTER (WHERE o_custkey IS NULL) AS violations
           FROM orders
           UNION ALL
           SELECT 'orders', 'o_totalprice', 'between',
                  count(*) FILTER (WHERE o_totalprice IS NOT NULL
                    AND o_totalprice NOT BETWEEN 0 AND 300000)
           FROM orders
           UNION ALL
           SELECT 'orders', 'o_orderstatus', 'in_set',
                  count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                    AND o_orderstatus NOT IN ('P', 'O', 'F'))
           FROM orders
           UNION ALL
           SELECT 'orders', 'o_orderpriority', 'in_set',
                  count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                    AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
                      '3-MEDIUM', '4-NOT SPECIFIED'))
           FROM orders
           UNION ALL
           SELECT 'orders', 'o_orderkey', 'unique',
                  count(o_orderkey) - count(DISTINCT o_orderkey)
           FROM orders
           UNION ALL
           SELECT 'events', 'user_id', 'not_null',
                  count(*) FILTER (WHERE user_id IS NULL)
           FROM events
           UNION ALL
           SELECT 'events', 'event_id', 'unique',
                  count(event_id) - count(DISTINCT event_id)
           FROM events
           UNION ALL
           SELECT 'lineitem', 'l_orderkey', 'fk',
                  (SELECT count(*) FROM lineitem l
                   WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
                     (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey))
           UNION ALL
           SELECT 'events', 'user_id', 'fk',
                  (SELECT count(*) FROM events e
                   WHERE e.user_id IS NOT NULL AND NOT EXISTS
                     (SELECT 1 FROM customer c
                      WHERE c.c_custkey = e.user_id)))
         SELECT tbl, col, expectation, violations,
                violations = 0 AS pass
         FROM rep ORDER BY tbl, col, expectation""",
    // max-over-union ≡ max-of-maxes: the engine's per-day registers
    // expanded + merged must equal the one-pass chain over the
    // expanded (target, user) pair set — sliding distinct via
    // register algebra, estimate hash-compared
    "hll_sliding" -> (hllChainSql(
      "SELECT DISTINCT d.day AS g, p.user_id AS k " +
        "FROM (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id " +
        "FROM events) p " +
        "JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d " +
        "ON p.day BETWEEN d.day - 6 AND d.day",
      salt = 777000L) + """,
         ex AS (SELECT d.day, count(DISTINCT p.user_id)
                         AS exact_users_7d
                FROM (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                      FROM events) p
                JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day
                      FROM events) d
                  ON p.day BETWEEN d.day - 6 AND d.day
                GROUP BY 1)
         SELECT ee.g AS day,
                CAST(floor(est + 0.5) AS BIGINT) AS approx_users_7d,
                exact_users_7d
         FROM ee JOIN ex ON ee.g = ex.day
         ORDER BY day"""),
    // the oracle is the ONE-PASS house-HLL replay: the Spark side
    // computes old ⊕ delta merged registers, so hash equality proves
    // merge consistency AND cross-engine replay of every per-month
    // estimate in one check (r10 — was a pinned-flag gate over
    // engine-specific DataSketches blobs)
    "hll_incremental" -> (hllChainSql(
      "SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) " +
        "AS g, o_custkey AS k FROM orders",
      salt = 424242L) + """,
         ex AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                         AS month,
                       count(DISTINCT o_custkey) AS exact_users
                FROM orders GROUP BY 1)
         SELECT ee.g AS month,
                CAST(floor(est + 0.5) AS BIGINT) AS est_users,
                exact_users
         FROM ee JOIN ex ON ee.g = ex.month
         ORDER BY month"""),
    // the oracle recomputes the view from the FULL join: equality
    // proves the delta algebra (old ∪ Δa⋈new ∪ old⋈Δb) is exact
    "join_incremental" ->
      """SELECT o_orderpriority,
                count(*) AS n_lines,
                count(DISTINCT o_orderkey) AS n_orders,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_cents
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_incremental" ->
      """WITH c AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
                             AS month,
                           CAST(round(o_totalprice * 100) AS BIGINT)
                             AS cents,
                           o_totalprice AS p
                    FROM orders)
         SELECT month, cnt, sum_cents, sum_cents // cnt AS avg_cents,
                min_price, max_price
         FROM (SELECT month, count(*) AS cnt,
                      CAST(sum(cents) AS BIGINT) AS sum_cents,
                      min(p) AS min_price, max(p) AS max_price
               FROM c GROUP BY month)
         ORDER BY month""",
    // the window DEFINITION of top-k per key — the engine answers it
    // with the bounded aggregator instead
    "topk_per_group" ->
      """WITH j AS (
           SELECT c.c_mktsegment AS seg,
                  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                  o_orderkey
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         r AS (SELECT seg, cents, o_orderkey,
                 row_number() OVER (PARTITION BY seg
                   ORDER BY cents DESC, o_orderkey ASC) AS rnk
               FROM j)
         SELECT seg, CAST(rnk AS INTEGER) AS rank, cents, o_orderkey
         FROM r WHERE rnk <= 3 ORDER BY seg, rank""",
    // the cumulative purchase-index trick, the position ranks, and
    // the exact e6 credit split replayed window for window
    "attribution" ->
      """WITH ev AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu
           FROM events
           WHERE event_type IN ('click', 'view', 'purchase')),
         m AS (SELECT *,
                 CAST(sum(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY tsu, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS pcum
               FROM ev),
         p AS (SELECT user_id, pcum AS p_idx FROM m
               WHERE event_type = 'purchase'),
         t AS (SELECT m.user_id, m.event_id, m.event_type, m.tsu,
                      m.pcum + 1 AS p_idx
               FROM m JOIN p ON m.user_id = p.user_id
                            AND m.pcum + 1 = p.p_idx
               WHERE m.event_type <> 'purchase'),
         r AS (SELECT *,
                 CAST(row_number() OVER (PARTITION BY user_id, p_idx
                   ORDER BY tsu, event_id) AS BIGINT) AS r,
                 CAST(count(*) OVER (PARTITION BY user_id, p_idx)
                   AS BIGINT) AS n
               FROM t),
         c AS (SELECT event_type,
                 CASE WHEN n = 1 THEN 1000000
                      WHEN n = 2 THEN 500000
                      WHEN r = 1 OR r = n THEN 400000
                      ELSE 200000 // (n - 2)
                           + (CASE WHEN r - 1 <= 200000 % (n - 2)
                              THEN 1 ELSE 0 END)
                 END AS credit
               FROM r)
         SELECT event_type, count(*)::BIGINT AS n_touches,
                CAST(sum(credit) AS BIGINT) AS credit_e6
         FROM c GROUP BY 1 ORDER BY 1""",
    // before/deleted/after recomputed independently per table
    // (two-hop cascade via the dead-order set); the orphan column
    // states the INVARIANT (0), so a skipped cascade step hash-fails
    // the same lattice: level-0 cells from the full QI, level 1 a
    // re-aggregation of those cells; floor(cents/2^18) replays the
    // power-of-two band exactly (quantile_hist discipline)
    "k_anonymity" ->
      """WITH cells AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(floor(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                             / 262144.0) AS BIGINT) AS band,
                  count(*) AS n
           FROM customer GROUP BY 1, 2, 3),
         l0 AS (SELECT c_nationkey,
                  CAST(sum(n) AS BIGINT) AS n_rows,
                  count(*) AS l0_groups,
                  CAST(sum(CASE WHEN n < 8 THEN 1 ELSE 0 END) AS BIGINT)
                    AS l0_risky_groups,
                  CAST(sum(CASE WHEN n < 8 THEN n ELSE 0 END) AS BIGINT)
                    AS l0_risky_rows
                FROM cells GROUP BY 1),
         g AS (SELECT c_nationkey, c_mktsegment, sum(n) AS m
               FROM cells GROUP BY 1, 2),
         l1 AS (SELECT c_nationkey,
                  CAST(sum(CASE WHEN m < 8 THEN m ELSE 0 END) AS BIGINT)
                    AS l1_risky_rows
                FROM g GROUP BY 1)
         SELECT l0.c_nationkey, n_rows, l0_groups, l0_risky_groups,
                l0_risky_rows, l1_risky_rows
         FROM l0 JOIN l1 ON l0.c_nationkey = l1.c_nationkey
         ORDER BY l0.c_nationkey""",
    "forget_user" ->
      """WITH del AS (SELECT c_custkey AS k FROM customer
                      WHERE c_custkey % 97 = 0),
         od AS (SELECT o_orderkey AS k FROM orders
                WHERE o_custkey IN (SELECT k FROM del))
         SELECT 'customer' AS tbl,
           (SELECT count(*) FROM customer)::BIGINT AS n_before,
           (SELECT count(*) FROM customer
             WHERE c_custkey IN (SELECT k FROM del))::BIGINT AS n_deleted,
           (SELECT count(*) FROM customer
             WHERE c_custkey NOT IN (SELECT k FROM del))::BIGINT AS n_after,
           0::BIGINT AS n_orphans
         UNION ALL SELECT 'orders',
           (SELECT count(*) FROM orders)::BIGINT,
           (SELECT count(*) FROM orders
             WHERE o_custkey IN (SELECT k FROM del))::BIGINT,
           (SELECT count(*) FROM orders
             WHERE o_custkey NOT IN (SELECT k FROM del))::BIGINT,
           0::BIGINT
         UNION ALL SELECT 'lineitem',
           (SELECT count(*) FROM lineitem)::BIGINT,
           (SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT k FROM od))::BIGINT,
           (SELECT count(*) FROM lineitem
             WHERE l_orderkey NOT IN (SELECT k FROM od))::BIGINT,
           0::BIGINT
         UNION ALL SELECT 'events',
           (SELECT count(*) FROM events)::BIGINT,
           (SELECT count(*) FROM events
             WHERE user_id IN (SELECT k FROM del))::BIGINT,
           (SELECT count(*) FROM events
             WHERE user_id NOT IN (SELECT k FROM del))::BIGINT,
           0::BIGINT
         ORDER BY tbl""",
    // one UNION arm per column: exact non-null + distinct counts — the
    // per-column truth the engine's one-scan Expand plan must match
    "profile_table" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""SELECT '$c' AS column_name, count($c)::BIGINT AS n_non_null,
            count(DISTINCT $c)::BIGINT AS n_distinct,
            (SELECT count(*) FROM orders)::BIGINT AS n_rows FROM orders"""
      }.mkString("", " UNION ALL ", " ORDER BY column_name")
    },
    // the engine's two-level rank decomposition pinned equal to the
    // textbook ntile() over the identical (n_chars, doc_id) total order
    "length_deciles" ->
      """WITH r AS (SELECT n_chars,
                           ntile(10) OVER (ORDER BY n_chars, doc_id)
                             AS decile
                    FROM documents)
         SELECT CAST(decile AS BIGINT) AS decile,
                count(*)::BIGINT AS n_docs,
                min(n_chars) AS min_len, max(n_chars) AS max_len
         FROM r GROUP BY decile ORDER BY decile""",
    "event_transitions" ->
      """WITH t AS (SELECT event_type,
                           lag(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                             AS prev_type
                    FROM events)
         SELECT prev_type, event_type AS next_type, count(*) AS n
         FROM t WHERE prev_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY prev_type, next_type""",
    "skew_stats" ->
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
         r AS (SELECT c,
                      row_number() OVER (ORDER BY c, user_id) AS rn,
                      count(*) OVER () AS n
               FROM c)
         SELECT count(*) AS n_keys,
                max(CASE WHEN rn = (n + 1) // 2 THEN c END) AS p50,
                max(CASE WHEN rn = (9 * n + 9) // 10 THEN c END) AS p90,
                max(c) AS max_c,
                (100 * max(c))
                  // max(CASE WHEN rn = (n + 1) // 2 THEN c END)
                  AS skew_ratio_pct
         FROM r""",
    // every diff class recomputed from the modular arithmetic that
    // DEFINED version B (see tableDiff)
    "table_diff" ->
      """SELECT * FROM (
           SELECT 'added' AS status, count(*) AS n FROM lineitem
           WHERE l_orderkey % 97 <> 0 AND l_orderkey % 83 = 0
           UNION ALL
           SELECT 'changed', count(*) FROM lineitem
           WHERE l_orderkey % 97 <> 0 AND l_orderkey % 89 = 0
           UNION ALL
           SELECT 'removed', count(*) FROM lineitem
           WHERE l_orderkey % 97 = 0
           UNION ALL
           SELECT 'unchanged', count(*) FROM lineitem
           WHERE l_orderkey % 97 <> 0 AND l_orderkey % 89 <> 0)
         ORDER BY status""",
    // batch recomputation of the STREAMING query's aggregate — the
    // gate is that AvailableNow micro-batching lands on the batch
    // answer (see streamDailyCounts)
    "stream_daily" ->
      """SELECT epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS day_us,
                event_type, count(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY day_us, event_type""",
    // stream ≡ batch for the governance cells: each rule's totals and
    // the e6 fail ratio recomputed over the full table
    "stream_dq" ->
      """WITH r AS (
           SELECT 'event_type_in_domain' AS rule, count(*) AS n_rows,
             sum(CASE WHEN event_type NOT IN
                 ('click', 'view', 'purchase', 'signup', 'error')
               THEN 1 ELSE 0 END) AS n_fail
           FROM events
           UNION ALL
           SELECT 'user_id_not_null', count(*),
             sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
           FROM events
           UNION ALL
           SELECT 'value_in_0_50', count(*),
             sum(CASE WHEN value < 0 OR value > 50 THEN 1 ELSE 0 END)
           FROM events)
         SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
                CAST(n_fail AS BIGINT) AS n_fail,
                CAST((n_fail * 1000000) // n_rows AS BIGINT) AS fail_e6
         FROM r ORDER BY rule""",
    // the whole watermark policy replayed in batch SQL: the staged
    // file membership (date-truncated min+20d/+25d cuts, event_id % 4
    // held back), the late-filter watermark (max event time of the
    // FIRST file minus 36 h — the value operative one batch before
    // the replay arrives), the drop rule (window end <= that
    // watermark), and the append-mode finalization rule (window end
    // <= max-overall minus 36 h)
    "stream_late" ->
      """WITH cut AS (SELECT date_trunc('day', min(ts))
                        + INTERVAL 20 DAY AS c20,
                      date_trunc('day', min(ts))
                        + INTERVAL 25 DAY AS c25 FROM events),
         wm1 AS (SELECT max(ts) - INTERVAL 36 HOUR AS w
                 FROM events, cut
                 WHERE ts < cut.c20 AND event_id % 4 <> 0),
         wmf AS (SELECT max(ts) - INTERVAL 36 HOUR AS w FROM events),
         base AS (SELECT date_trunc('day', ts) AS day, event_type,
                    (event_id % 4 = 0 AND ts < (SELECT c25 FROM cut))
                      AS is_late
                  FROM events),
         acc AS (SELECT day, event_type, count(*) AS n_stream
                 FROM base, wm1
                 WHERE NOT (is_late AND day + INTERVAL 1 DAY <= wm1.w)
                 GROUP BY 1, 2),
         alln AS (SELECT day, event_type, count(*) AS n_all
                  FROM base GROUP BY 1, 2)
         SELECT epoch_us(acc.day) AS day_us, acc.event_type,
                acc.n_stream, alln.n_all,
                alln.n_all - acc.n_stream AS late_dropped
         FROM acc JOIN alln USING (day, event_type), wmf
         WHERE acc.day + INTERVAL 1 DAY <= wmf.w
         ORDER BY day_us, event_type""",
    "stream_enrich" ->
      """SELECT c.c_mktsegment, e.event_type, count(*) AS n
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""",
    // batch DISTINCT recomputation of the streaming keyed dedup —
    // the gate is that dropDuplicatesWithinWatermark state survives
    // real micro-batch boundaries without re-emitting (streamDedup)
    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type,
                epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS day_us
         FROM events ORDER BY user_id, event_type, day_us""",
    // final CDC snapshot = pure function of each user's globally
    // latest event (the last batch containing a key writes its final
    // row); error-terminated users are tombstoned
    "stream_cdc" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                  value,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts) DESC,
                                              event_id DESC) AS rn
           FROM events)
         SELECT user_id, event_id, event_type AS etype, ts_us,
                round(value, 4) AS value_r
         FROM e WHERE rn = 1 AND event_type <> 'error'
         ORDER BY user_id""",
    "join_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk,
                           round(sum(c_acctbal), 2) AS cust_bal
                    FROM customer GROUP BY 1),
         p AS (SELECT s_nationkey AS nk,
                      round(sum(s_acctbal), 2) AS supp_bal
               FROM supplier GROUP BY 1)
         SELECT coalesce(c.nk, p.nk) AS nk, c.cust_bal, p.supp_bal
         FROM c FULL OUTER JOIN p ON c.nk = p.nk ORDER BY nk""",
    "window_ranks" ->
      """SELECT c_mktsegment, c_custkey,
                CAST(rank() OVER w AS INTEGER) AS rnk,
                CAST(dense_rank() OVER w AS INTEGER) AS drnk,
                round(percent_rank() OVER w, 6) AS prnk,
                round(cume_dist() OVER w, 6) AS cdist,
                CAST(ntile(4) OVER w AS INTEGER) AS quartile
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey)
         ORDER BY c_mktsegment, rnk, c_custkey""",
    // n_rows recomputed; round-trip flags pinned (the xxhash64 digest
    // is engine-specific — see syncChecksum)
    "sync_checksum" ->
      """SELECT count(*) AS n_rows,
                CAST(1 AS INTEGER) AS rows_preserved,
                CAST(1 AS INTEGER) AS checksum_equal,
                CAST(1 AS INTEGER) AS digest_nonzero
         FROM lineitem""",
    // all-pairs exact recompute: both coordinates' mix64 chains
    // replayed in UBIGINT SQL (two columns through the shared
    // stages), floorMod to the grid, then the independent n²/2
    // distance check the cell join must reproduce exactly
    "spatial_join" -> (spatialPtChainSql + """
       SELECT a.id AS id_a, b.id AS id_b,
              (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                AS dist2
       FROM pt a JOIN pt b ON a.id < b.id
       WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             <= 1440000
       ORDER BY id_a, id_b"""),
    // independent component recompute: recursive transitive closure
    // over the all-pairs within-D edge set, min reachable id per node
    // (singletons seed themselves); D = 2000 on the id % 10 subset
    "spatial_clusters" -> (spatialPtChainSql.replaceFirst("WITH ",
      "WITH RECURSIVE ") + """,
       sub AS (SELECT id, x, y FROM pt WHERE id % 10 = 0),
       e0 AS (SELECT a.id AS s, b.id AS t
              FROM sub a JOIN sub b ON a.id <> b.id
              WHERE (a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y) <= 4000000),
       reach AS (SELECT id, id AS r FROM sub
                 UNION
                 SELECT e0.t AS id, reach.r
                 FROM reach JOIN e0 ON e0.s = reach.id)
       SELECT id, min(r) AS cluster_id FROM reach
       GROUP BY id ORDER BY id"""),
    // bounded-radius kNN from the same independent all-pairs
    // recompute: rank by (dist², id) within the D-ball per query
    "spatial_knn" -> (spatialPtChainSql + """
       SELECT qid, nid, dist2, rnk FROM (
         SELECT q.id AS qid, b.id AS nid,
                (q.x - b.x) * (q.x - b.x) + (q.y - b.y) * (q.y - b.y)
                  AS dist2,
                CAST(row_number() OVER (PARTITION BY q.id
                  ORDER BY (q.x - b.x) * (q.x - b.x)
                           + (q.y - b.y) * (q.y - b.y), b.id)
                     AS INTEGER) AS rnk
         FROM pt q JOIN pt b ON q.id % 20 = 0 AND b.id <> q.id
         WHERE (q.x - b.x) * (q.x - b.x) + (q.y - b.y) * (q.y - b.y)
               <= 1440000)
       WHERE rnk <= 3 ORDER BY qid, rnk"""),
    // the digest's mix64 chain replayed bit-for-bit in UBIGINT
    // split-multiply SQL (the reservoir_sample idiom), signed
    // reinterpretation, then the day-grouped exact sum
    "partition_manifest" -> manifestOracleSql,
    // the streamed manifest's final state must equal the batch
    // recompute — shared oracle, the stream_ema discipline
    "stream_manifest" -> manifestOracleSql,
    // both sides' digest chains + the same perturbation arithmetic
    "manifest_diff" -> manifestDiffOracleSql,
    // the re-pull plan: non-match days merged into contiguous windows
    "backfill_windows" -> backfillWindowsOracleSql,
    // preservation invariants the oracle derives independently
    "compact_roundtrip" ->
      """SELECT count(*) AS n_rows, CAST(1 AS INTEGER) AS checksum_match,
                CAST(1 AS INTEGER) AS files_reduced
         FROM events""",
    "merge_upsert" ->
      """WITH changes AS (
           SELECT c_custkey AS k, CAST(NULL AS VARCHAR) AS c_name,
                  CAST(NULL AS INTEGER) AS c_nationkey,
                  c_acctbal + 100.0 AS c_acctbal,
                  CAST(NULL AS VARCHAR) AS c_mktsegment, false AS del
           FROM customer WHERE c_custkey % 10 = 3
           UNION ALL
           SELECT c_custkey, NULL, NULL, CAST(NULL AS DOUBLE), NULL, true
           FROM customer WHERE c_custkey % 10 = 7
           UNION ALL
           SELECT c_custkey + 1000000000, 'NEW_' || c_custkey,
                  c_nationkey, 0.0, 'NEW', false
           FROM customer WHERE c_custkey % 10 = 1)
         SELECT coalesce(s.k, t.c_custkey) AS c_custkey,
                coalesce(s.c_name, t.c_name) AS c_name,
                coalesce(s.c_nationkey, t.c_nationkey) AS c_nationkey,
                coalesce(s.c_acctbal, t.c_acctbal) AS c_acctbal,
                coalesce(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
         FROM customer t FULL OUTER JOIN changes s ON t.c_custkey = s.k
         WHERE NOT coalesce(s.del, false)
         ORDER BY c_custkey""",
    "format_roundtrip" ->
      """SELECT count(*) AS n_rows,
                CAST(1 AS INTEGER) AS csv_rows_preserved,
                CAST(1 AS INTEGER) AS csv_checksum_equal,
                CAST(1 AS INTEGER) AS json_rows_preserved,
                CAST(1 AS INTEGER) AS json_checksum_equal,
                CAST(1 AS INTEGER) AS orc_rows_preserved,
                CAST(1 AS INTEGER) AS orc_checksum_equal
         FROM orders""",
    "gap_fill" ->
      """WITH daily AS (
           SELECT user_id, day, obs FROM (
             SELECT user_id, CAST(ts AS DATE) AS day, value AS obs,
                    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                       ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) WHERE rn = 1),
         grid AS (
           SELECT user_id,
                  unnest(generate_series(min(day), max(day),
                                         INTERVAL 1 DAY))::DATE AS day
           FROM daily GROUP BY user_id)
         SELECT g.user_id, epoch_us(g.day::TIMESTAMP) AS day_us,
                last_value(d.obs IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.day
                  ROWS UNBOUNDED PRECEDING) AS value,
                CAST(CASE WHEN d.obs IS NOT NULL THEN 1 ELSE 0 END
                     AS INTEGER) AS is_observed
         FROM grid g LEFT JOIN daily d
           ON g.user_id = d.user_id AND g.day = d.day
         ORDER BY g.user_id, day_us""",
    "fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, a.c_name AS s_a,
                b.c_custkey AS id_b, b.c_name AS s_b
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY id_a, id_b""",
    // the whole ER pipeline replayed: levenshtein match pairs, the
    // recursive closure to min-key entities, singleton self-entities,
    // and the survivorship consolidation (canonical name + exact-cents
    // balance merge)
    "entity_resolution" ->
      """WITH RECURSIVE p AS (
           SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
           FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
           WHERE levenshtein(a.c_name, b.c_name) <= 1
             AND a.c_nationkey = b.c_nationkey),
         e AS (SELECT id_a AS src, id_b AS dst FROM p
               UNION SELECT id_b, id_a FROM p),
         reach(id, r) AS (
           SELECT src, src FROM e
           UNION
           SELECT w.id, e2.dst FROM reach w JOIN e e2 ON w.r = e2.src),
         lab AS (SELECT id, min(r) AS entity_id FROM reach GROUP BY id),
         full_lab AS (
           SELECT c.c_custkey AS id,
                  coalesce(lab.entity_id, c.c_custkey) AS entity_id,
                  CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
           FROM customer c LEFT JOIN lab ON lab.id = c.c_custkey),
         g AS (SELECT entity_id, count(*) AS n_members,
                      CAST(sum(cents) AS BIGINT) AS acctbal_cents
               FROM full_lab GROUP BY entity_id)
         SELECT g.entity_id, g.n_members, c.c_name AS canonical_name,
                g.acctbal_cents
         FROM g JOIN customer c ON c.c_custkey = g.entity_id
         ORDER BY g.entity_id""",
    // every membership decision replayed: the three mix64 chains in
    // UBIGINT SQL rebuild the bit-position set from the build keys,
    // and a probe passes iff all k=3 positions are present — the
    // false-positive set itself hash-compares
    "bloom_house" -> {
      def sm(i: Long) = java.lang.Long.toUnsignedString(
        graft.functions.Kernels.mix64(i))
      s"""WITH build AS (SELECT s_suppkey AS k FROM supplier
                     WHERE s_suppkey % 7 = 0),
       probe AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
       allk AS (SELECT 'b' AS side, k FROM build
                UNION ALL SELECT 'p' AS side, k FROM probe),
       un AS (SELECT side, k, xor(CAST(k AS UBIGINT), sm) AS u
              FROM allk, (VALUES (${sm(5001L)}::UBIGINT),
                                 (${sm(5002L)}::UBIGINT),
                                 (${sm(5003L)}::UBIGINT)) AS salts(sm)),
       z1t AS (SELECT side, k,
                 CAST((CAST(u AS HUGEINT) + 11400714819323198485)
                      % 18446744073709551616 AS UBIGINT) AS z1 FROM un),
       z2t AS (SELECT side, k,
                 CAST(((CAST(xor(z1, z1 >> 30) % 4294967296 AS HUGEINT)
                        * 13787848793156543929)
                       + (((CAST(xor(z1, z1 >> 30) // 4294967296
                              AS HUGEINT)
                            * 484763065) % 4294967296) * 4294967296))
                      % 18446744073709551616 AS UBIGINT) AS z2 FROM z1t),
       z3t AS (SELECT side, k,
                 CAST(((CAST(xor(z2, z2 >> 27) % 4294967296 AS HUGEINT)
                        * 10723151780598845931)
                       + (((CAST(xor(z2, z2 >> 27) // 4294967296
                              AS HUGEINT)
                            * 321982955) % 4294967296) * 4294967296))
                      % 18446744073709551616 AS UBIGINT) AS z3 FROM z2t),
       hvt AS (SELECT side, k, xor(z3, z3 >> 31) AS hv FROM z3t),
       pos AS (SELECT side, k, CAST(hv & 127 AS BIGINT) AS p FROM hvt),
       bits AS (SELECT DISTINCT p FROM pos WHERE side = 'b'),
       hits AS (SELECT pos.k AS k, count(*) AS c
                FROM pos JOIN bits USING (p) WHERE side = 'p'
                GROUP BY pos.k)
       SELECT h.k AS l_suppkey,
              CAST(CASE WHEN b2.k IS NOT NULL THEN 1 ELSE 0 END
                   AS INTEGER) AS is_member
       FROM hits h LEFT JOIN (SELECT DISTINCT k FROM build) b2
         ON h.k = b2.k
       WHERE c = 3 ORDER BY l_suppkey"""
    },
    // n_total/n_exact recomputed exactly; the bitmap's three gate
    // flags are pinned (see bloomPrune)
    "bloom_prune" ->
      """SELECT (SELECT count(*) FROM lineitem) AS n_total,
                (SELECT count(*) FROM lineitem WHERE l_suppkey IN
                   (SELECT s_suppkey FROM supplier
                    WHERE s_acctbal >= 9000)) AS n_exact,
                CAST(1 AS INTEGER) AS no_false_negatives,
                CAST(1 AS INTEGER) AS pruned_selective,
                CAST(1 AS INTEGER) AS fp_bounded""",
    "scd2_intervals" ->
      """SELECT user_id,
                CAST(row_number() OVER w AS INTEGER) AS version,
                event_type, value,
                epoch_us(ts) AS valid_from_us,
                epoch_us(lead(ts) OVER w) AS valid_to_us,
                CAST(CASE WHEN lead(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS INTEGER) AS is_current
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, version""",
    // the salted two-phase must be INDISTINGUISHABLE from the plain
    // global window — the oracle IS that global window over the hot
    // 5-value key
    "scd2_salted" ->
      """SELECT event_type,
                CAST(row_number() OVER w AS INTEGER) AS version,
                event_id, value,
                epoch_us(ts) AS valid_from_us,
                epoch_us(lead(ts) OVER w) AS valid_to_us,
                CAST(CASE WHEN lead(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS INTEGER) AS is_current
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
         ORDER BY event_type, version""",
    // the point-in-time lookup over the same window-numbered history
    "scd2_asof" ->
      """WITH dim AS (SELECT user_id,
                  CAST(row_number() OVER w AS INTEGER) AS version,
                  event_type, epoch_us(ts) AS f,
                  epoch_us(lead(ts) OVER w) AS t
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
         probes AS (SELECT DISTINCT user_id,
                      epoch_us(CAST(d0 + o AS TIMESTAMP)) AS probe_us
                    FROM events, d0, (VALUES (5), (15), (25)) AS v(o)
                    WHERE user_id % 20 = 0)
         SELECT p.user_id, p.probe_us, d.version, d.event_type
         FROM probes p JOIN dim d
           ON d.user_id = p.user_id AND d.f <= p.probe_us
          AND (d.t IS NULL OR p.probe_us < d.t)
         ORDER BY p.user_id, p.probe_us""",
    // 3 power iterations unrolled; every sum is CAST back to BIGINT
    // (DuckDB promotes integer sums to HUGEINT, which would
    // hash-mismatch Spark's BIGINT even at identical values)
    "pagerank_delta" -> pagerankDeltaOracleSql,
    "pagerank" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                            1099511627776 + l_suppkey AS dst
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY 1),
         n AS (SELECT count(*) AS n FROM deg),
         r0 AS (SELECT id, deg, 1000000000000 // n.n AS r FROM deg, n),
         m1 AS (SELECT e.dst AS id, CAST(sum(r0.r // r0.deg) AS BIGINT) AS f
                FROM r0 JOIN e ON r0.id = e.src GROUP BY 1),
         r1 AS (SELECT d.id, d.deg,
                       150000000000 // n.n + (85 * coalesce(m1.f, 0)) // 100 AS r
                FROM deg d CROSS JOIN n LEFT JOIN m1 ON d.id = m1.id),
         m2 AS (SELECT e.dst AS id, CAST(sum(r1.r // r1.deg) AS BIGINT) AS f
                FROM r1 JOIN e ON r1.id = e.src GROUP BY 1),
         r2 AS (SELECT d.id, d.deg,
                       150000000000 // n.n + (85 * coalesce(m2.f, 0)) // 100 AS r
                FROM deg d CROSS JOIN n LEFT JOIN m2 ON d.id = m2.id),
         m3 AS (SELECT e.dst AS id, CAST(sum(r2.r // r2.deg) AS BIGINT) AS f
                FROM r2 JOIN e ON r2.id = e.src GROUP BY 1),
         r3 AS (SELECT d.id, d.deg,
                       150000000000 // n.n + (85 * coalesce(m3.f, 0)) // 100 AS r
                FROM deg d CROSS JOIN n LEFT JOIN m3 ON d.id = m3.id)
         SELECT id, deg, CAST(r AS BIGINT) AS rank_e12 FROM r3
         ORDER BY rank_e12 DESC, id LIMIT 100""",
    "kcore" ->
      """WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                            1099511627776 + l_suppkey AS dst
                     FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         r0 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         r1 AS (SELECT src, dst FROM (
                  SELECT src, dst,
                         count(*) OVER (PARTITION BY src) AS ds,
                         count(*) OVER (PARTITION BY dst) AS dd
                  FROM r0) WHERE ds >= 8 AND dd >= 8),
         r2 AS (SELECT src, dst FROM (
                  SELECT src, dst,
                         count(*) OVER (PARTITION BY src) AS ds,
                         count(*) OVER (PARTITION BY dst) AS dd
                  FROM r1) WHERE ds >= 8 AND dd >= 8),
         r3 AS (SELECT src, dst FROM (
                  SELECT src, dst,
                         count(*) OVER (PARTITION BY src) AS ds,
                         count(*) OVER (PARTITION BY dst) AS dd
                  FROM r2) WHERE ds >= 8 AND dd >= 8),
         r4 AS (SELECT src, dst FROM (
                  SELECT src, dst,
                         count(*) OVER (PARTITION BY src) AS ds,
                         count(*) OVER (PARTITION BY dst) AS dd
                  FROM r3) WHERE ds >= 8 AND dd >= 8),
         r5 AS (SELECT src, dst FROM (
                  SELECT src, dst,
                         count(*) OVER (PARTITION BY src) AS ds,
                         count(*) OVER (PARTITION BY dst) AS dd
                  FROM r4) WHERE ds >= 8 AND dd >= 8)
         SELECT src AS id, count(*) AS deg FROM r5
         GROUP BY src ORDER BY src""",
    // the house HLL replayed end to end: the mix64 chain in UBIGINT
    // split-multiply SQL (the manifest-digest precedent), registers
    // as integer max aggregates, the exact HUGEINT Z-sum, and the
    // same rational-alpha raw estimate / linear-counting branch —
    // the ESTIMATE hash-compares, not just its error envelope
    // per-column sketch profiling: one chain over the stacked
    // (column, key) relation — g IS the column name; plus (r11) the
    // per-column quantile histogram replay (integer binw from the
    // column's own range, rank-edge p50/p90 bin-edge values)
    "profile_sketch" -> (hllChainSql(
      "SELECT DISTINCT col_name AS g, k FROM (" +
        profileStackSql + ") WHERE k IS NOT NULL",
      salt = 99L) + """,
         ex AS (SELECT g AS col_name, count(*) AS exact_distinct
                FROM pr GROUP BY 1),
         praw AS (SELECT col_name, k FROM (""" + profileStackSql + """)
                  WHERE k IS NOT NULL),
         pstv AS (SELECT col_name, min(k) AS mnk, max(k) AS mxk,
                    count(*) AS n_values,
                    (max(k) - min(k) + 4096) // 4096 AS binw
                  FROM praw GROUP BY 1),
         phc AS (SELECT r.col_name, (r.k - s.mnk) // s.binw AS bin,
                   count(*) AS c
                 FROM praw r JOIN pstv s USING (col_name)
                 GROUP BY 1, 2),
         pcc AS (SELECT col_name, bin, c,
                   sum(c) OVER (PARTITION BY col_name
                                ORDER BY bin) AS cum,
                   sum(c) OVER (PARTITION BY col_name) AS n
                 FROM phc),
         pqt AS (SELECT col_name,
                   min(CASE WHEN cum >= (n + 1) // 2 THEN bin END)
                     AS b50,
                   min(CASE WHEN cum >= (9 * n + 9) // 10 THEN bin END)
                     AS b90
                 FROM pcc GROUP BY col_name)
         SELECT ee.g AS col_name,
                CAST(floor(est + 0.5) AS BIGINT) AS approx_distinct,
                exact_distinct,
                s.n_values, CAST(s.binw AS BIGINT) AS binw,
                CAST(s.mnk + pqt.b50 * s.binw AS BIGINT) AS p50_est,
                CAST(s.mnk + pqt.b90 * s.binw AS BIGINT) AS p90_est
         FROM ee JOIN ex ON ee.g = ex.col_name
              JOIN pstv s ON ee.g = s.col_name
              JOIN pqt ON ee.g = pqt.col_name
         ORDER BY col_name"""),
    "approx_distinct" -> approxDistinctOracleSql,
    // singles AND pair-unions through ONE register chain over the
    // stacked (g, k) relation, then integer inclusion–exclusion —
    // the intersection ESTIMATES hash-compare
    "hll_intersect" -> (hllChainSql(
      """SELECT DISTINCT g, k FROM (
           SELECT event_type AS g, user_id AS k FROM events
           UNION ALL
           SELECT p.ta || '|' || p.tb AS g, d.u AS k
           FROM (SELECT DISTINCT event_type AS t, user_id AS u
                 FROM events) d
           JOIN (SELECT a.t AS ta, b.t AS tb
                 FROM (SELECT DISTINCT event_type AS t FROM events) a
                 JOIN (SELECT DISTINCT event_type AS t FROM events) b
                   ON a.t < b.t) p
             ON d.t = p.ta OR d.t = p.tb)""",
      salt = 555000L) + """,
         ipl AS (SELECT a.t AS ta, b.t AS tb
                 FROM (SELECT DISTINCT event_type AS t FROM events) a
                 JOIN (SELECT DISTINCT event_type AS t FROM events) b
                   ON a.t < b.t),
         idu AS (SELECT DISTINCT event_type AS t, user_id AS u
                 FROM events),
         ixn AS (SELECT x.t AS ta, y.t AS tb,
                   count(*) AS exact_intersect
                 FROM idu x JOIN idu y ON x.u = y.u AND x.t < y.t
                 GROUP BY 1, 2),
         ief AS (SELECT g, CAST(floor(est + 0.5) AS BIGINT) AS est
                 FROM ee)
         SELECT ipl.ta AS type_a, ipl.tb AS type_b,
                ea.est AS approx_a, eb.est AS approx_b,
                eu.est AS approx_union,
                GREATEST(0, ea.est + eb.est - eu.est)
                  AS approx_intersect,
                coalesce(x.exact_intersect, 0) AS exact_intersect
         FROM ipl JOIN ief ea ON ea.g = ipl.ta
              JOIN ief eb ON eb.g = ipl.tb
              JOIN ief eu ON eu.g = ipl.ta || '|' || ipl.tb
              LEFT JOIN ixn x ON x.ta = ipl.ta AND x.tb = ipl.tb
         ORDER BY type_a, type_b"""),
    // the streamed register store max-merges to the SAME registers as
    // one pass, so the 15th stream shape shares the batch oracle
    // verbatim — the stream_ema discipline
    "stream_distinct" -> approxDistinctOracleSql,
    // the gate keeps the semantic accuracy contract (a bit-equal
    // wrong estimator would still hash-match the row above)
    "approx_distinct_bound" ->
      """SELECT count(DISTINCT event_type) AS n_groups,
                CAST(5 AS INTEGER) AS err_bound_pct,
                CAST(1 AS INTEGER) AS all_within
         FROM events""",
    // the streamed histogram merges by addition, so the batch
    // recompute over events IS its oracle (the stream_ema discipline)
    // count cells merge by addition, so the plain batch recompute IS
    // the merged-store result; the rank runs at read on both sides
    "stream_topk" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS n
                FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, user_id, CAST(n AS BIGINT) AS n,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY n DESC, user_id) AS rnk
               FROM c)
         SELECT event_type, CAST(rnk AS BIGINT) AS rnk, user_id, n
         FROM r WHERE rnk <= 3 ORDER BY event_type, rnk""",
    "stream_quantile" ->
      """WITH c AS (SELECT event_type,
                  CAST(floor(CAST(floor(value * 100 + 0.5) AS BIGINT)
                             / 512.0) AS BIGINT) AS bin,
                  count(*) AS c
                FROM events GROUP BY 1, 2),
         cc AS (SELECT event_type, bin, c,
                  sum(c) OVER (PARTITION BY event_type
                               ORDER BY bin) AS cum,
                  sum(c) OVER (PARTITION BY event_type) AS n
                FROM c)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                CAST(min(CASE WHEN cum >= (n + 1) // 2
                          THEN bin END) * 512 AS BIGINT)
                  AS p50_bin_cents,
                CAST(min(CASE WHEN cum >= (9 * n + 9) // 10
                          THEN bin END) * 512 AS BIGINT)
                  AS p90_bin_cents
         FROM cc GROUP BY event_type ORDER BY event_type""",
    // the histogram quantile's APPROXIMATE VALUES replayed exactly:
    // integer bin counts, integer ceil ranks, bin-edge estimates.
    // Binning is FLOOR division via exact power-of-two double
    // division on both engines (DuckDB's integer `//` truncates
    // toward zero like Spark's DIV — fine on these non-negative
    // domains, but the floor form is sign-robust)
    // both medians replayed by the explicit (n+1)//2 rank rule over
    // the same cell tables; the deviation re-bin and the 3*MAD count
    // weigh cells exactly as the engine does
    "mad_outliers" ->
      """WITH cells AS (SELECT event_type,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                  count(*) AS c
                FROM events GROUP BY 1, 2),
         q AS (SELECT event_type, cents, c,
                 sum(c) OVER (PARTITION BY event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n
               FROM cells),
         med AS (SELECT event_type,
                   min(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
                     AS med_cents,
                   CAST(max(n) AS BIGINT) AS n
                 FROM q GROUP BY 1),
         dev AS (SELECT c2.event_type,
                   abs(c2.cents - m.med_cents) AS dev,
                   CAST(sum(c2.c) AS BIGINT) AS c
                 FROM cells c2
                 JOIN med m ON c2.event_type = m.event_type
                 GROUP BY 1, 2),
         dq AS (SELECT event_type, dev, c,
                  sum(c) OVER (PARTITION BY event_type ORDER BY dev
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum,
                  sum(c) OVER (PARTITION BY event_type) AS n
                FROM dev),
         mad AS (SELECT event_type,
                   min(CASE WHEN cum >= (n + 1) // 2 THEN dev END)
                     AS mad_cents
                 FROM dq GROUP BY 1)
         SELECT m.event_type, m.n, m.med_cents, mad.mad_cents,
                CAST(sum(CASE WHEN d.dev > 3 * mad.mad_cents
                         THEN d.c ELSE 0 END) AS BIGINT) AS n_outliers
         FROM dev d
         JOIN med m ON d.event_type = m.event_type
         JOIN mad ON d.event_type = mad.event_type
         GROUP BY 1, 2, 3, 4
         ORDER BY m.event_type""",
    "quantile_hist" ->
      """WITH c AS (SELECT o_orderpriority AS g,
                  CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                             / 16384.0) AS BIGINT) AS bin,
                  count(*) AS c
                FROM orders GROUP BY 1, 2),
         cc AS (SELECT g, bin, c,
                  sum(c) OVER (PARTITION BY g ORDER BY bin) AS cum,
                  sum(c) OVER (PARTITION BY g) AS n
                FROM c)
         SELECT g AS o_orderpriority, CAST(max(n) AS BIGINT) AS n,
                CAST(min(CASE WHEN cum >= (n + 1) // 2
                          THEN bin END) * 16384 AS BIGINT)
                  AS p50_bin_cents,
                CAST(min(CASE WHEN cum >= (9 * n + 9) // 10
                          THEN bin END) * 16384 AS BIGINT)
                  AS p90_bin_cents
         FROM cc GROUP BY g ORDER BY g""",
    // histogram-driven range sharding replayed exactly: integer bin
    // counts, integer ceil-rank boundaries, bin-monotone assignment
    "range_shard" -> rangeShardOracleSql,
    // histogram cells merge by ADDITION, so the incrementally
    // maintained shard map shares the one-pass oracle VERBATIM (the
    // stream_distinct / approx_distinct precedent)
    "range_shard_delta" -> rangeShardOracleSql,
    // like the HLL gate: exact percentiles recomputed, sketch bound
    // pinned to 1 (a drifting percentile_approx breaks the hash)
    "percentile_bound" ->
      """WITH r AS (
           SELECT o_orderpriority, o_totalprice,
                  row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice) AS rn,
                  count(*) OVER (PARTITION BY o_orderpriority) AS n
           FROM orders)
         SELECT o_orderpriority,
                CAST(round(max(CASE WHEN rn = (n + 1) // 2
                               THEN o_totalprice END) * 100) AS BIGINT)
                  AS p50_cents,
                CAST(round(max(CASE WHEN rn = (9 * n + 9) // 10
                               THEN o_totalprice END) * 100) AS BIGINT)
                  AS p90_cents,
                CAST(1 AS INTEGER) AS bound_met
         FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "zorder_key" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(
                  list_sum([(((l_partkey % 65536) >> i) & 1) << (2*i)
                            FOR i IN range(0, 16)]) +
                  list_sum([(((l_suppkey % 65536) >> i) & 1) << (2*i + 1)
                            FOR i IN range(0, 16)])
                AS BIGINT) AS zkey
         FROM lineitem ORDER BY zkey, l_orderkey, l_linenumber""",
    // the xy2d Hilbert walk unrolled: 16 chained CTEs, each one
    // rotation level of pure integer CASE/XOR arithmetic — every key
    // value recomputed from (partkey, suppkey)
    "hilbert_key" -> hilbertOracleSql,
    // the dim is re-declared inline with the SAME weights + filter the
    // staged dim parquet carries; the fact side reads the RAW events
    // table, so the oracle also proves the partitioned staged copy
    // preserved every row and value
    "dpp_join" ->
      """WITH dim(event_type, w) AS (VALUES
           ('click', 1), ('error', 9), ('purchase', 3),
           ('signup', 7), ('view', 8))
         SELECT e.event_type, count(*) AS n_events,
                CAST(sum(CAST(round(e.value * 100) AS BIGINT)) * d.w
                     AS BIGINT) AS weighted_cents
         FROM events e JOIN dim d USING (event_type)
         WHERE d.w <= 7
         GROUP BY e.event_type, d.w
         ORDER BY e.event_type""",
    "unpivot_events" ->
      """SELECT user_id, event_type, count(*) AS n
         FROM events GROUP BY user_id, event_type
         HAVING count(*) > 0
         ORDER BY user_id, event_type""",
    "topk_freq" ->
      """SELECT user_id, rnk, event_type AS etype, n AS cnt FROM (
           SELECT user_id, event_type, count(*) AS n,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY count(*) DESC, event_type)
                  AS INTEGER) AS rnk
           FROM events GROUP BY user_id, event_type)
         WHERE rnk <= 3 ORDER BY user_id, rnk""",
    "anomaly_events" ->
      """WITH st AS (
           SELECT event_type, avg(value) AS mu,
                  stddev_samp(value) AS sigma
           FROM events GROUP BY 1)
         SELECT event_id, e.event_type,
                round(value, 4) AS value_r,
                round((value - mu) / sigma, 4) AS z_r
         FROM events e JOIN st USING (event_type)
         WHERE sigma > 0 AND abs(value - mu) > 3 * sigma
         ORDER BY event_id""",
    "assoc_rules" ->
      """WITH b AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
           FROM events),
         nb AS (SELECT count(*) AS n FROM
                  (SELECT DISTINCT user_id, day FROM b)),
         s AS (SELECT event_type, count(*) AS n_item FROM b GROUP BY 1),
         p AS (SELECT x.event_type AS antecedent,
                      y.event_type AS consequent, count(*) AS n_both
               FROM b x JOIN b y
                 ON x.user_id = y.user_id AND x.day = y.day
                AND x.event_type <> y.event_type
               GROUP BY 1, 2)
         SELECT antecedent, consequent, n_both,
                CAST(n_both * 1000000 // nb.n AS BIGINT) AS support_e6,
                CAST(n_both * 1000000 // sa.n_item AS BIGINT)
                  AS confidence_e6,
                CAST(n_both * nb.n * 1000000 // (sa.n_item * sc.n_item)
                     AS BIGINT) AS lift_e6
         FROM p, nb,
              s sa, s sc
         WHERE sa.event_type = p.antecedent
           AND sc.event_type = p.consequent
         ORDER BY antecedent, consequent""",
    "retention_cohorts" ->
      """WITH e AS (
           SELECT user_id, date_trunc('week', ts) AS wk FROM events),
         c AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
         a AS (SELECT DISTINCT user_id, wk FROM e)
         SELECT epoch_us(c.cohort) AS cohort_us,
                CAST(datediff('day', CAST(c.cohort AS DATE),
                              CAST(a.wk AS DATE)) // 7 AS BIGINT)
                  AS week_offset,
                CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
         FROM a JOIN c ON a.user_id = c.user_id
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "funnel_ordered" ->
      """WITH e AS (
           SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events),
         s1 AS (SELECT user_id, min(tsu) AS t_signup FROM e
                WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id, min(tsu) AS t_click
                FROM e JOIN s1 ON e.user_id = s1.user_id
                WHERE event_type = 'click' AND tsu > t_signup GROUP BY 1),
         s3 AS (SELECT e.user_id, min(tsu) AS t_purchase
                FROM e JOIN s2 ON e.user_id = s2.user_id
                WHERE event_type = 'purchase' AND tsu > t_click GROUP BY 1)
         SELECT s1.user_id, t_signup, t_click, t_purchase,
                CAST(1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
                       + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END
                     AS INTEGER) AS stages_reached
         FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
                 LEFT JOIN s3 ON s1.user_id = s3.user_id
         ORDER BY s1.user_id""",
    // the whole Count–Min sketch replayed bit-for-bit: FNV-1a token
    // fold + TWO SplitMix64 chains (token hash, then the salted
    // row-hash family) in UBIGINT with split lo/hi multiplies — the
    // dedup_simhash-replay tradition applied to a sketch, so the
    // ESTIMATES (not just guarantee flags) hash-match
    // both sketches' cells via the shuffle_key mix64 chain (salts
    // 97..100 baked in as UBIGINT literals), the per-row inner
    // products, the row-min estimate, and the exact Σ cA·cB truth —
    // every value hash-compared
    "cms_join_est" -> cmsJoinEstOracleSql,
    "cms_freq" ->
      """WITH tk AS (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
           FROM documents),
         cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
         f AS (
           SELECT tok, c,
                  list_reduce(
                    list_prepend(14695981039346656037::UBIGINT,
                      list_transform(range(1, length(tok) + 1),
                                     i -> CAST(ord(tok[i]) AS UBIGINT))),
                    (acc, ch) -> CAST((CAST(xor(acc, ch) AS HUGEINT) * 1099511628211)
                                      % 18446744073709551616 AS UBIGINT)) AS f0
           FROM cnt),
         m1 AS (SELECT tok, c,
                  CAST((CAST(f0 AS HUGEINT) + 11400714819323198485)
                       % 18446744073709551616 AS UBIGINT) AS z1 FROM f),
         m2 AS (SELECT tok, c,
                  CAST(((CAST(xor(z1, z1 >> 30) % 4294967296 AS HUGEINT) * 13787848793156543929) + (((CAST(xor(z1, z1 >> 30) // 4294967296 AS HUGEINT) * 484763065) % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z2 FROM m1),
         m3 AS (SELECT tok, c,
                  CAST(((CAST(xor(z2, z2 >> 27) % 4294967296 AS HUGEINT) * 10723151780598845931) + (((CAST(xor(z2, z2 >> 27) // 4294967296 AS HUGEINT) * 321982955) % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z3 FROM m2),
         th AS (SELECT tok, c, xor(z3, z3 >> 31) AS h FROM m3),
         sl AS (SELECT th.tok, th.c, s.r, xor(th.h, s.s) AS u
                FROM th CROSS JOIN (VALUES
                  (0, 13679457532755275413::UBIGINT),
                  (1, 13432527470776545160::UBIGINT),
                  (2, 18105923034897077331::UBIGINT),
                  (3, 17864077645780634326::UBIGINT)) AS s(r, s)),
         n1 AS (SELECT tok, c, r,
                  CAST((CAST(u AS HUGEINT) + 11400714819323198485)
                       % 18446744073709551616 AS UBIGINT) AS z1 FROM sl),
         n2 AS (SELECT tok, c, r,
                  CAST(((CAST(xor(z1, z1 >> 30) % 4294967296 AS HUGEINT) * 13787848793156543929) + (((CAST(xor(z1, z1 >> 30) // 4294967296 AS HUGEINT) * 484763065) % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z2 FROM n1),
         n3 AS (SELECT tok, c, r,
                  CAST(((CAST(xor(z2, z2 >> 27) % 4294967296 AS HUGEINT) * 10723151780598845931) + (((CAST(xor(z2, z2 >> 27) // 4294967296 AS HUGEINT) * 321982955) % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z3 FROM n2),
         bk AS (SELECT tok, c, r,
                  CAST((xor(z3, z3 >> 31) >> 32) % 16 AS INTEGER) AS b FROM n3),
         cells AS (SELECT r, b, CAST(sum(c) AS BIGINT) AS cell_cnt
                   FROM bk GROUP BY r, b),
         est AS (SELECT bk.tok, bk.c, min(cells.cell_cnt) AS est
                 FROM bk JOIN cells ON bk.r = cells.r AND bk.b = cells.b
                 GROUP BY bk.tok, bk.c)
         SELECT tok, est, c AS true_cnt, est - c AS over_cnt
         FROM est ORDER BY tok""",
    // like the HLL/percentile gates: the exact side (token distincts)
    // recomputed in SQL, the order-invariant guarantee flags pinned
    "topk_freq_bound" ->
      """WITH tok AS (
           SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\W+'),
                                     x -> len(x) > 0)) AS token
           FROM documents)
         SELECT CAST(LEAST(8, count(DISTINCT token)) AS BIGINT)
                  AS n_counters,
                CAST(1 AS INTEGER) AS sum_eq_n,
                CAST(1 AS INTEGER) AS all_overestimate,
                CAST(1 AS INTEGER) AS err_within,
                CAST(1 AS INTEGER) AS hh_covered
         FROM tok""",
    "range_join" ->
      """SELECT a.user_id, a.event_id AS event_id_a, b.event_id AS event_id_b,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
         FROM events a JOIN events b
           ON a.user_id = b.user_id
          AND epoch_us(b.ts) > epoch_us(a.ts)
          AND epoch_us(b.ts) <= epoch_us(a.ts) + 21600000000
         ORDER BY a.user_id, event_id_a, event_id_b""",
    "asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           (SELECT max(epoch_us(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click'
              AND c.ts <= p.ts) AS asof_click_us
         FROM events p WHERE p.event_type = 'purchase'
         ORDER BY event_id""",
    // the total nearest rule replayed: (|delta|, t, tie) LIMIT 1 per
    // probe — hash-pins the tie semantics, not just the happy path
    "asof_nearest" ->
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
         probes AS (SELECT DISTINCT user_id,
                      epoch_us(CAST(d0 + o AS TIMESTAMP))
                        + 41820000000 AS probe_us
                    FROM events, d0, (VALUES (5), (15), (25)) AS v(o)
                    WHERE user_id % 20 = 0),
         cand AS (SELECT p.user_id, p.probe_us, e.event_id,
                    abs(epoch_us(e.ts) - p.probe_us) AS d,
                    epoch_us(e.ts) AS t
                  FROM probes p JOIN events e
                    ON e.user_id = p.user_id),
         r AS (SELECT *, row_number() OVER (
                 PARTITION BY user_id, probe_us
                 ORDER BY d, t, event_id) AS rn
               FROM cand)
         SELECT user_id, probe_us, event_id AS nearest_event_id,
                CAST(d AS BIGINT) AS delta_us
         FROM r WHERE rn = 1 ORDER BY user_id, probe_us""",
    "pivot_events" ->
      """SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "sample_deterministic" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 2) <= '19'
         ORDER BY event_id""",
    // the rounding recurrence unrolled as a RECURSIVE CTE: step rn
    // joins step rn+1; `//` trunc = the engine's int64 `/` on this
    // non-negative domain. stream_ema shares it verbatim: the
    // streamed trajectory must be BIT-EQUAL to the batch recurrence
    "ema_smooth" -> emaOracleSql,
    "stream_ema" -> emaOracleSql,
    "holt_linear" -> holtOracleSql,
    // both recursive chains + the lag self-join + integer MAEs; the
    // holt_wins verdict compares raw error SUMS (same denominator)
    // daily counts joined to their own day-7/day-1 predecessors by
    // DATE arithmetic; both error sums over the both-present day set
    "seasonality_strength" -> seasonalityOracleSql,
    // the streamed deployment must land on the identical verdicts
    "stream_seasonal" -> seasonalityOracleSql,
    // the OLS replay: identical daily cells, epoch-day x, the five
    // int64 sufficient statistics, and the signed |num|-DIV-then-sign
    // slope
    "trend_daily" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                               count(*) AS y
                        FROM events GROUP BY 1, 2),
         c AS (SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', day)
                      AS BIGINT) AS x,
                 y
               FROM daily),
         g AS (SELECT event_type, count(*) AS m,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
               FROM c GROUP BY event_type)
         SELECT event_type, m,
                CAST(m * sxy - sx * sy AS BIGINT) AS num,
                CAST(CASE WHEN m * sxx - sx * sx = 0 THEN NULL
                          WHEN m * sxy - sx * sy >= 0
                          THEN ((m * sxy - sx * sy) * 1000000)
                               // (m * sxx - sx * sx)
                          ELSE -(((-(m * sxy - sx * sy)) * 1000000)
                                 // (m * sxx - sx * sx))
                     END AS BIGINT) AS slope_e6,
                CAST(CASE WHEN m * sxy - sx * sy > 0 THEN 1 ELSE 0 END
                     AS INTEGER) AS trending
         FROM g ORDER BY event_type""",
    // the ACF replay: identical daily cells, per-lag self-join, the
    // six int64 sufficient statistics, integer numerator/variances,
    // and the one exactly-rounded double step (mul, sqrt, div, round)
    "acf_daily" ->
      """WITH daily AS (SELECT event_type AS et, CAST(ts AS DATE) AS day,
                               count(*) AS n
                        FROM events GROUP BY 1, 2),
         legs AS (
           SELECT d.et, 1 AS lag, d.n AS x, p.n AS y
           FROM daily d JOIN daily p
             ON p.et = d.et AND p.day = d.day - 1
           UNION ALL
           SELECT d.et, 7 AS lag, d.n AS x, p.n AS y
           FROM daily d JOIN daily p
             ON p.et = d.et AND p.day = d.day - 7),
         g AS (SELECT et AS event_type, lag,
                 count(*) AS m,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy,
                 CAST(sum(x * y) AS BIGINT) AS sxy
               FROM legs GROUP BY 1, 2)
         SELECT event_type, CAST(lag AS INTEGER) AS lag, m,
                CAST(m * sxy - sx * sy AS BIGINT) AS num,
                CASE WHEN m * sxx - sx * sx > 0
                      AND m * syy - sy * sy > 0
                     THEN round(CAST(m * sxy - sx * sy AS DOUBLE)
                            / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                                   * CAST(m * syy - sy * sy AS DOUBLE)), 4)
                     ELSE NULL END AS acf_r
         FROM g ORDER BY event_type, lag""",
    "forecast_backtest" ->
      """WITH RECURSIVE s AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v_e6
           FROM events),
         r0 AS (SELECT user_id, event_id, v_e6,
                  CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS BIGINT) AS rn
                FROM s),
         ema AS (
           SELECT user_id, rn, v_e6, v_e6 AS ema_e6
           FROM r0 WHERE rn = 1
           UNION ALL
           SELECT n.user_id, n.rn, n.v_e6,
                  (1 * n.v_e6 + 3 * e.ema_e6) // 4
           FROM ema e JOIN r0 n
             ON n.user_id = e.user_id AND n.rn = e.rn + 1),
         h AS (
           SELECT user_id, rn, v_e6,
                  v_e6 AS level_e6, CAST(0 AS BIGINT) AS trend_e6
           FROM r0 WHERE rn = 1
           UNION ALL
           SELECT n.user_id, n.rn, n.v_e6,
                  (1 * n.v_e6 + 3 * (h.level_e6 + h.trend_e6)) // 4,
                  (1 * ((1 * n.v_e6 + 3 * (h.level_e6 + h.trend_e6)) // 4
                        - h.level_e6)
                   + 7 * h.trend_e6) // 8
           FROM h JOIN r0 n
             ON n.user_id = h.user_id AND n.rn = h.rn + 1),
         j AS (SELECT e.user_id, e.rn, e.v_e6, e.ema_e6,
                      h.level_e6 + h.trend_e6 AS fc_e6
               FROM ema e JOIN h
                 ON e.user_id = h.user_id AND e.rn = h.rn),
         er AS (SELECT c.user_id,
                       abs(c.v_e6 - p.fc_e6) AS eh,
                       abs(c.v_e6 - p.ema_e6) AS ee
                FROM j c JOIN j p
                  ON c.user_id = p.user_id AND c.rn = p.rn + 1)
         SELECT user_id, count(*) AS n_steps,
                CAST(sum(eh) // count(*) AS BIGINT) AS holt_mae_e6,
                CAST(sum(ee) // count(*) AS BIGINT) AS ema_mae_e6,
                CAST(CASE WHEN sum(eh) < sum(ee) THEN 1 ELSE 0 END
                     AS INTEGER) AS holt_wins
         FROM er GROUP BY user_id ORDER BY user_id""",
    // stream_anomaly shares the batch replay verbatim: the streamed
    // (rn, ema, dev, flag) trajectory must be BIT-EQUAL to batch
    "ema_anomaly" -> anomalyOracleSql,
    "stream_anomaly" -> anomalyOracleSql,
    "moving_sum_7d" ->
      """SELECT user_id, event_id, epoch_us(ts) AS tsu,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS mv7
         FROM events ORDER BY user_id, tsu, event_id""",
    // the sweep replayed: running max end over PRECEDING rows within
    // the key, only the part past the high-water mark counts
    "interval_union" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS start_us,
             CAST(floor(least(greatest(value, 0) * 60, 86400) * 1000000)
                  AS BIGINT) AS dur_us
           FROM events),
         x AS (SELECT user_id, event_id, start_us, dur_us,
                      start_us + dur_us AS end_us FROM e),
         p AS (SELECT *, max(end_us) OVER (PARTITION BY user_id
                 ORDER BY start_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max_end FROM x),
         c AS (SELECT user_id, dur_us,
                 greatest(end_us - greatest(start_us,
                   coalesce(prev_max_end, start_us)), 0) AS covered_us
               FROM p)
         SELECT user_id, count(*)::BIGINT AS n_events,
           CAST(sum(dur_us) AS BIGINT) AS raw_us,
           CAST(sum(covered_us) AS BIGINT) AS covered_us,
           CAST(sum(dur_us) - sum(covered_us) AS BIGINT) AS overlap_us
         FROM c GROUP BY user_id ORDER BY user_id""",
    "sessionize" ->
      """WITH f AS (
           SELECT user_id, event_id, epoch_us(ts) AS tsu,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         s AS (
           SELECT user_id, tsu,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY tsu, event_id)
                  AS BIGINT) AS session_id
           FROM f)
         SELECT user_id, session_id, count(*) AS n_events,
                min(tsu) AS start_us, max(tsu) AS end_us
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "skew_join" ->
      """SELECT c.c_mktsegment, count(*) AS n,
           round(sum(e.value), 2) AS sum_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
    // batch recomputation of the STATEFUL streaming query: with the
    // watermark pinned beyond the data's range, the stream emits
    // exactly the sessions closed by a later out-of-gap event — every
    // session except each user's last (see streamSessionize)
    "stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS buy_id,
                epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS buy_us
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND epoch_us(p.ts) >= epoch_us(c.ts)
          AND epoch_us(p.ts) <= epoch_us(c.ts) + 86400000000
         ORDER BY c.user_id, click_id, buy_id""",
    // the eviction decomposition: (full inner join) UNION (unmatched
    // clicks whose 24 h window the FINAL watermark closed; still-open
    // windows stay in state unemitted, exactly as the stream leaves
    // them). The watermark is defined per BRANCH (each side tracks the
    // max event time of ITS filtered rows), and the query's global
    // watermark is the MIN of the two minus the 1 h delay — NOT the
    // global max; the distinction is one row at sf0.001
    "stream_outer_join" ->
      """WITH mx AS (SELECT least(
                       (SELECT max(epoch_us(ts)) FROM events
                        WHERE event_type = 'click'),
                       (SELECT max(epoch_us(ts)) FROM events
                        WHERE event_type = 'purchase'))
                     - 3600000000 AS wm),
         clicks AS (SELECT user_id, event_id AS click_id,
                           epoch_us(ts) AS click_us
                    FROM events WHERE event_type = 'click'),
         buys AS (SELECT user_id, event_id AS buy_id,
                         epoch_us(ts) AS buy_us
                  FROM events WHERE event_type = 'purchase'),
         matched AS (SELECT c.user_id, c.click_id, b.buy_id,
                            c.click_us, b.buy_us
                     FROM clicks c JOIN buys b
                       ON c.user_id = b.user_id
                      AND b.buy_us >= c.click_us
                      AND b.buy_us <= c.click_us + 86400000000)
         SELECT user_id, click_id, buy_id, click_us, buy_us FROM matched
         UNION ALL
         SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS buy_id,
                c.click_us, CAST(NULL AS BIGINT) AS buy_us
         FROM clicks c
         WHERE NOT EXISTS (SELECT 1 FROM matched m
                           WHERE m.click_id = c.click_id)
           AND c.click_us + 86400000000 < (SELECT wm FROM mx)
         ORDER BY user_id, click_id, buy_id""",
    "stream_sessionize" ->
      """WITH f AS (
           SELECT user_id, event_id, epoch_us(ts) AS tsu,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         s AS (
           SELECT user_id, tsu,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY tsu, event_id)
                  AS BIGINT) AS session_id
           FROM f),
         g AS (
           SELECT user_id, session_id, count(*) AS n_events,
                  min(tsu) AS start_us, max(tsu) AS end_us
           FROM s GROUP BY user_id, session_id),
         m AS (SELECT user_id, max(session_id) AS last_sess
               FROM g GROUP BY user_id)
         SELECT g.user_id, g.session_id, g.n_events,
                g.start_us, g.end_us
         FROM g JOIN m ON g.user_id = m.user_id
                      AND g.session_id < m.last_sess
         ORDER BY g.user_id, g.session_id""")
}
