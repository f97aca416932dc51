package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** House HyperLogLog distinct-count estimator — a cross-engine-
  * replayable replacement for `approx_count_distinct` (Spark's HLL++
  * register blob is engine-specific; this sketch is plain integer
  * aggregates any SQL engine recomputes bit for bit — the suite's
  * DuckDB oracle replays it end to end).
  *
  * Construction (Flajolet et al. 2007, m = 1024 / p = 10):
  *  - h = mix64(key ⊕ mix64(salt)) ([[graft.functions.dsl.shuffle_key]],
  *    the codegen'd scan-stage kernel the manifest digest shares);
  *  - register address = h & (m−1); ρ = trailing zeros of the
  *    remaining 54 bits + 1 = bit_count(w ⊕ (w−1)) — pure integer,
  *    no float log2;
  *  - register value = max(ρ) per (group, bucket) — a plain aggregate,
  *    order/partition/engine-independent;
  *  - the indicator Z⁻¹ = Σ 2^−ρ rides EXACTLY as the integer
  *    Σ 2^(55−ρ) in DECIMAL (a float sum would be accumulation-order-
  *    dependent), empty buckets contributing 2⁵⁵; α_m enters as the
  *    exact rational 7213·m/(10000·m+10790), so the raw estimate is a
  *    single double division of two exactly-determined integers;
  *  - linear-counting correction when V > 0 and E ≤ 2.5m.
  *
  * Scale shape: one scan-stage hash per row, shuffle carries at most
  * |groups| × 1024 register cells (map-side max-combine), and the
  * registers are MERGEABLE by max — the incremental-maintenance
  * property `hll_incremental` drives end to end (old ⊕ delta
  * registers hash-checked against the oracle's one-pass replay),
  * with state as plain (group, bucket, r) rows instead of opaque
  * blobs.
  *
  * Accuracy (σ = 1.04/√m ≈ 3.25%): measured ≤ 2.7% on the events
  * corpus at every test SF, ≤ 6.3% on synthetic cardinalities up to
  * 5·10⁵ (HllSpec) — gated at 5% on driver data by
  * `approx_distinct_bound`.
  */
object Hll {

  /** Per-group register table (group columns + bucket → r). Exposed
    * so callers can persist/merge registers incrementally (merge =
    * max per (group, bucket)).
    */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: Column,
                salt: Long): DataFrame = {
    import graft.functions.dsl.shuffle_key
    df.select(groupCols.map(col) :+ shuffle_key(keyCol, salt).as("h"): _*)
      .select(groupCols.map(col) ++ Seq(expr("h & 1023").as("bucket"),
        expr("shiftrightunsigned(h, 10)").as("w")): _*)
      .select(groupCols.map(col) ++ Seq(col("bucket"),
        when(col("w") === 0, lit(55))
          .otherwise(expr("bit_count(w ^ (w - 1))")).as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Estimate from a [[registers]] table: one row per group with
    * `est_users` (BIGINT, rounded). All arithmetic up to the final
    * division/ln is exact integer — see object doc.
    */
  def estimate(regs: DataFrame, groupCols: Seq[String],
               outCol: String): DataFrame =
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("nz"),
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 55 - r) " +
          "AS DECIMAL(20,0))")).as("s_nz"))
      .select(groupCols.map(col) ++ Seq((lit(1024) - col("nz")).as("v"),
        (col("s_nz") + (lit(1024) - col("nz")) *
          lit(new java.math.BigDecimal("36028797018963968")))
          .cast("double").as("sd")): _*)
      // α_m·m²·2⁵⁵ = 7213·m³·2⁵⁵/(10000m+10790): the numerator
      // 7213·2⁸⁵ is exactly double-representable (13-bit mantissa);
      // the denominator is one double multiply both engines spell
      // identically
      .select(groupCols.map(col) ++ Seq(col("v"),
        (lit("279039421980170247588980719616").cast("double") /
          (lit(10250790.0) * col("sd"))).as("est_raw")): _*)
      .select(groupCols.map(col) :+
        when(col("v") > 0 && col("est_raw") <= 2560.0,
          lit(1024.0) * expr("ln(1024.0 / CAST(v AS DOUBLE))"))
          .otherwise(col("est_raw")).as("est"): _*)
      .select(groupCols.map(col) :+
        floor(col("est") + 0.5).cast("long").as(outCol): _*)

  /** Per-group approximate distinct count of `keyCol`. */
  def distinctCount(df: DataFrame, groupCols: Seq[String], keyCol: Column,
                    salt: Long, outCol: String): DataFrame =
    estimate(registers(df, groupCols, keyCol, salt), groupCols, outCol)
}
