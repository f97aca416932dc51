package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Hll

/** The house HyperLogLog ([[graft.ops.Hll]]) — both estimator regimes
  * and the register-merge property the driver query can't reach:
  * `approx_distinct` runs at corpus cardinalities that stay in the
  * linear-counting branch, so the raw-formula branch and mergeability
  * are pinned here on synthetic cardinalities.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def estimateOf(n: Long): (Long, Long) = {
    val df = spark.range(0, n).select(lit(1L).as("g"), col("id"))
    val est = Hll.distinctCount(df, Seq("g"), col("id"),
        salt = 777000L, outCol = "est")
      .head().getLong(1)
    (n, est)
  }

  test("linear-counting regime: small cardinalities within 5%") {
    for (n <- Seq(100L, 1000L, 2000L)) {
      val (_, est) = estimateOf(n)
      assert(math.abs(est - n).toDouble / n < 0.05,
        s"n=$n est=$est")
    }
  }

  test("raw-estimate regime: large cardinalities within 3 sigma " +
      "(sigma = 1.04/sqrt(1024) ~ 3.25%)") {
    for (n <- Seq(10000L, 50000L, 200000L)) {
      val (_, est) = estimateOf(n)
      assert(math.abs(est - n).toDouble / n < 0.0975,
        s"n=$n est=$est")
    }
  }

  test("registers merge by max: union of two halves' registers " +
      "estimates like the one-pass sketch") {
    val a = spark.range(0, 5000).select(lit(1L).as("g"), col("id"))
    val b = spark.range(2500, 10000).select(lit(1L).as("g"), col("id"))
    val merged = Hll.registers(a, Seq("g"), col("id"), 777000L)
      .unionByName(Hll.registers(b, Seq("g"), col("id"), 777000L))
      .groupBy(col("g"), col("bucket")).agg(max(col("r")).as("r"))
    val mergedEst = Hll.estimate(merged, Seq("g"), "est")
      .head().getLong(1)
    val onePass = Hll.distinctCount(
        spark.range(0, 10000).select(lit(1L).as("g"), col("id")),
        Seq("g"), col("id"), 777000L, "est")
      .head().getLong(1)
    assert(mergedEst == onePass,
      s"merged=$mergedEst onePass=$onePass — max-merge must be " +
        "indistinguishable from one pass")
  }
}
