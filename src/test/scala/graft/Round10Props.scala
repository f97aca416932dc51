package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels.mix64
import graft.ops.{AsOfJoin, Hll, Scd}

/** Property checks for the round-10 operators — brute-force
  * equivalence on seeded pseudo-random inputs, covering shapes the
  * driver corpus never produces (duplicate timestamps at bucket
  * boundaries, sparse keys, adversarial tie pile-ups). All data is
  * generated from the house mix64 stream, so failures reproduce.
  */
class Round10Props extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def rnd(seed: Long, i: Long, mod: Long): Long =
    Math.floorMod(mix64(seed * 1000003L + i), mod)

  test("type2Salted ≡ type2 on random change logs incl. duplicate " +
      "timestamps and hot keys (weekly-aligned buckets)") {
    for (seed <- 1L to 3L) {
      val rows = (0L until 400L).map { i =>
        val key = rnd(seed, i * 3, 4)          // 4 hot keys
        val dayMs = rnd(seed, i * 3 + 1, 40) * 86400000L
        // coarse time grid → plenty of exact ties within a key
        val ts = new java.sql.Timestamp(dayMs +
          rnd(seed, i * 3 + 2, 4) * 3600000L)
        (key, ts, i, s"v$i")
      }
      val df = rows.toDF("k", "ts", "id", "payload")
      val bucket = expr("datediff(to_date(ts), DATE'1970-01-01') div 7")
      def canon(out: org.apache.spark.sql.DataFrame) = out
        .select(col("k"), col("version"), col("id"),
          col("valid_from").cast("long"), col("valid_to").cast("long"),
          col("is_current"))
        .collect().map(_.toSeq).toSet
      val plain = canon(Scd.type2(df, Seq("k"), "ts", "id",
        Seq("payload")))
      val salted = canon(Scd.type2Salted(df, Seq("k"), "ts", "id",
        Seq("payload"), bucket))
      assert(salted == plain, s"seed $seed: salted != plain")
    }
  }

  test("asofNearest ≡ brute-force nearest under the total " +
      "(|Δ|, t, tie) rule, with and without tolerance") {
    for (seed <- 1L to 3L) {
      val right = (0L until 200L).map { i =>
        (rnd(seed, i * 2, 5), rnd(seed, i * 2 + 1, 1000), i, i * 10)
      } // (k, t, id, v) — coarse t → equal-time and equal-delta ties
      val left = (0L until 80L).map { j =>
        (rnd(seed, 7000 + j * 2, 5), rnd(seed, 7000 + j * 2 + 1, 1000))
      }
      for (tol <- Seq(None, Some(37L))) {
        val got = AsOfJoin.asofNearest(
            left.toDF("k", "t"), right.toDF("k", "t", "id", "v"),
            keyCol = "k", timeCol = "t", payloadCol = "v", tieCol = "id",
            tolerance = tol)
          .select(col("k"), col("t"), col("asof_v"))
          .collect()
          .map(r => ((r.getLong(0), r.getLong(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))
        // brute force: min by (|Δ|, t, id) within tolerance
        val byKey = right.groupBy(_._1)
        got.foreach { case ((k, t), v) =>
          val cands = byKey.getOrElse(k, Seq.empty)
            .filter(c => tol.forall(x => math.abs(c._2 - t) <= x))
          val want =
            if (cands.isEmpty) None
            else Some(cands.minBy(c =>
              (math.abs(c._2 - t), c._2, c._3))._4)
          assert(v == want,
            s"seed $seed tol $tol k=$k t=$t: got $v want $want")
        }
      }
    }
  }

  test("Hll registers are partitioning-invariant: 1-partition and " +
      "32-partition inputs yield identical register sets") {
    val base = spark.range(0, 20000)
      .select((col("id") % 3).as("g"), col("id"))
    def regSet(df: org.apache.spark.sql.DataFrame) =
      Hll.registers(df, Seq("g"), col("id"), salt = 777000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
    assert(regSet(base.coalesce(1)) == regSet(base.repartition(32)),
      "registers must not depend on physical partitioning")
  }
}
