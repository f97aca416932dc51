package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Projection

class ProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("signMatrix: deterministic, right shape, ±1 density near 1/3") {
    val a = Projection.signMatrix(8, 64, seed = 17L)
    val b = Projection.signMatrix(8, 64, seed = 17L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == 8 && a.forall(_.length == 64))
    assert(a.flatten.forall(v => v == -1 || v == 0 || v == 1))
    val nz = a.flatten.count(_ != 0)
    assert(nz > 512 / 6 && nz < 512 / 2, s"nonzero count $nz out of band")
  }

  test("project: map-only output, deterministic across partitioning") {
    val mat = Projection.signMatrix(4, 8, seed = 5L)
    val rows = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(d => (i * 8 + d) * 0.01f)))
    val df = rows.toDF("id", "v")
    val p1 = Projection.project(df.repartition(1), "id", "v", mat)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val p7 = Projection.project(df.repartition(7), "id", "v", mat)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(p1 == p7)
    assert(p1.head.length == 5) // id + y0..y3
  }

  test("project: unscaled coordinate equals hand-computed signed sum") {
    // fixed 1x4 matrix exercised directly (bypass the PRNG)
    val mat = Array(Array(1, -1, 0, 1))
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("id", "v")
    val y = Projection.project(df, "id", "v", mat).head().getDouble(1)
    // (1 - 2 + 4) * sqrt(3/1) = 3 * 1.7320508... -> rounded to 4dp
    assert(y == math.rint(3 * math.sqrt(3.0) * 1e4) / 1e4 ||
      math.abs(y - 3 * math.sqrt(3.0)) < 1e-4)
  }

  test("project: map-only plan — zero exchanges before presentation") {
    val mat = Projection.signMatrix(4, 8, seed = 5L)
    val df = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(d => d * 0.5f))).toDF("id", "v")
    val plan = Projection.project(df, "id", "v", mat)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection must not shuffle, got:\n$plan")
  }

  test("oracleSql: one aliased output per matrix row, 1-based indexing") {
    val mat = Array(Array(1, 0, -1), Array(0, 1, 0))
    val sql = Projection.oracleSql(mat)
    assert(sql.contains("AS y0") && sql.contains("AS y1"))
    assert(sql.contains("embedding[1]") && sql.contains("embedding[3]"))
    assert(!sql.contains("embedding[0]"))
    assert(sql.contains("sqrt(3.0/2)"))
  }
}
