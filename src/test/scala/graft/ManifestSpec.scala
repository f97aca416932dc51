package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ManifestSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** wrapSigned64 must equal two's-complement truncation of the exact
    * sum — BigInt.longValue IS that truncation, so it serves as the
    * independent reference. Boundary cells: ±2⁶³ land exactly on the
    * sign flip, ±2⁶⁴ on the wrap identity, and the r8 manifest digest
    * magnitudes (~2×10²⁰) sit in the range the driver gate rejected.
    */
  test("wrapSigned64 matches two's-complement truncation at the " +
      "boundaries and at manifest-digest magnitudes") {
    import spark.implicits._
    val cases: Seq[BigInt] = Seq(
      BigInt(0), BigInt(1), BigInt(-1),
      BigInt(Long.MaxValue), BigInt(Long.MinValue),
      BigInt(2).pow(63), -BigInt(2).pow(63),
      BigInt(2).pow(63) + 1, BigInt(2).pow(64), -BigInt(2).pow(64),
      BigInt(2).pow(64) + 5, -(BigInt(2).pow(64) + 5),
      BigInt("215000000000000000000"), BigInt("-215000000000000000000"))
    val df = cases.map(_.toString).toDF("s")
      .select(col("s").cast("decimal(38,0)").as("d"))
      .select(col("d"), graft.ops.Manifest.wrapSigned64(col("d")).as("w"))
    val got = df.collect()
      .map(r => (BigInt(r.getDecimal(0).toBigInteger), r.getLong(1)))
      .toMap
    cases.foreach { c =>
      assert(got(c) == c.longValue,
        s"wrap($c) = ${got(c)}, want ${c.longValue}")
    }
  }

  test("the wrapped digest is invariant to batch splits (additivity " +
      "survives the wrap)") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (java.sql.Date.valueOf("2024-03-01"), i))
    val whole = graft.ops.Manifest
      .dayCells(rows.toDF("day", "id"), col("day"), col("id"), 7L)
    val parts = Seq(rows.take(123), rows.slice(123, 321), rows.drop(321))
      .map(p => graft.ops.Manifest
        .dayCells(p.toDF("day", "id"), col("day"), col("id"), 7L))
      .reduce(_.unionByName(_))
    def digestOf(cells: org.apache.spark.sql.DataFrame): Long = cells
      .groupBy(col("day"))
      .agg(graft.ops.Manifest.wrapSigned64(sum(col("dg"))).as("digest"))
      .head().getLong(1)
    assert(digestOf(whole) == digestOf(parts))
  }
}
