package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** SQ8 scalar quantization: stats exactness, code determinism across
  * partitioning, the per-dimension reconstruction bound, and the
  * constant-dimension edge.
  */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def vecs(n: Int, d: Int) =
    (0 until n).map(i =>
      (i.toLong, Array.tabulate(d)(j =>
        math.sin(i * 31 + j * 7).toFloat * (j + 1))))

  test("sqStats: exact per-dimension min/max") {
    val rows = vecs(200, 6)
    val df = rows.toDF("id", "v")
    val (mns, mxs) = Similarity.sqStats(df, "v")
    for (j <- 0 until 6) {
      val col = rows.map(_._2(j).toDouble)
      assert(mns(j) == col.min && mxs(j) == col.max, s"dim $j")
    }
  }

  test("sqEncode: codes in [0,255], deterministic across partitioning") {
    val df = vecs(300, 8).toDF("id", "v")
    val (mns, mxs) = Similarity.sqStats(df, "v")
    def codes(parts: Int) =
      Similarity.sqEncode(df.repartition(parts), "id", "v", mns, mxs)
        .orderBy("id").select("code").collect()
        .map(_.getSeq[Long](0).toSeq).toSeq
    val c1 = codes(1)
    assert(c1 == codes(7))
    assert(c1.flatten.forall(q => q >= 0 && q <= 255))
    // extremes map to the ends of the code range
    assert(c1.flatten.min == 0L && c1.flatten.max == 255L)
  }

  test("sqDecode: every cell within half a quantization step") {
    val df = vecs(300, 8).toDF("id", "v")
    val (mns, mxs) = Similarity.sqStats(df, "v")
    val dec = Similarity.sqDecode(
      Similarity.sqEncode(df, "id", "v", mns, mxs), mns, mxs)
    val rows = dec.select("v", "v_hat").collect()
    for (r <- rows; j <- 0 until 8) {
      val err = math.abs(r.getSeq[Double](0)(j) - r.getSeq[Double](1)(j))
      val bound = (mxs(j) - mns(j)) / 510.0 + 1e-9
      assert(err <= bound, s"dim $j err $err > $bound")
    }
  }

  test("constant dimensions encode to 0 and decode back exactly") {
    val df = (0 until 20).map(i =>
      (i.toLong, Array(3.5f, i.toFloat))).toDF("id", "v")
    val (mns, mxs) = Similarity.sqStats(df, "v")
    val dec = Similarity.sqDecode(
      Similarity.sqEncode(df, "id", "v", mns, mxs), mns, mxs)
    val r = dec.orderBy("id").select("code", "v_hat").collect()
    assert(r.forall(_.getSeq[Long](0).head == 0L))
    assert(r.forall(_.getSeq[Double](1).head == 3.5))
  }
}
