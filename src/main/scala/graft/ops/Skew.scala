package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the manual escalation beyond
  * AQE's automatic skew-join splitting (SCALE.md): salt the skewed
  * (large) side into `saltFactor` sub-keys and replicate the build
  * (small) side across all salts. Shuffle then spreads each hot key
  * over `saltFactor` partitions.
  *
  * Use when one key's rows exceed a healthy partition (boilerplate
  * documents in an LSH bucket, a mega-customer in a fact join).
  * Cost: build side is duplicated ×saltFactor — keep it the smaller
  * side.
  */
object Skew {

  /** Inner equi-join `probe ⋈ build` on `key`, with the probe side
    * salted and the build side replicated.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt from row content spreads a hot key evenly
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(saltFactor)))
    val replicated = build
      .withColumn("__salt0", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt0").cast("long"))
      .drop("__salt0")
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
