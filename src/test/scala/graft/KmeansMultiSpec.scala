package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Pins the fused multi-subspace trainer to the unfused one:
  * [[Similarity.kmeansTrainMulti]] must produce the same codebooks as
  * m independent [[Similarity.kmeansTrain]] runs over sliced vectors —
  * the equivalence that lets pqEncode cut m·iters·2 corpus scans to
  * iters·2 without perturbing any trained artifact downstream
  * (pq codes, IVF-PQ rankings, gate floors).
  */
class KmeansMultiSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def maxAbsDiff(a: Array[Array[Float]], b: Array[Array[Float]]): Double = {
    assert(a.length == b.length)
    a.zip(b).map { case (ca, cb) =>
      assert(ca.length == cb.length)
      ca.zip(cb).map { case (x, y) => math.abs(x.toDouble - y.toDouble) }.max
    }.max
  }

  test("fused trainer matches m independent sliced trainings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val m = 8
    val k = 16
    val iters = 2
    val dim = emb.select(size(col("embedding").cast("array<float>")))
      .head().getInt(0)
    val sub = dim / m

    val (fused, history) =
      Similarity.kmeansTrainMulti(emb, "vec_id", "embedding", m, k, iters)

    assert(fused.length == m)
    assert(history.length == iters)

    for (j <- 0 until m) {
      val (unfused, _) = Similarity.kmeansTrain(
        emb.select(col("vec_id"),
          slice(col("embedding").cast("array<float>"), j * sub + 1, sub)
            .as("subv")),
        "vec_id", "subv", k, iters)
      // identical seeds + identical per-row arithmetic; only the
      // floating merge order of partial aggregates can differ, so the
      // codebooks agree to float round-off, not merely approximately
      val d = maxAbsDiff(fused(j), unfused)
      assert(d < 1e-5, s"subspace $j codebook diverged: maxAbsDiff=$d")
    }
  }

  test("fused SSE history is monotone per subspace (spherical Lloyd)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (_, history) =
      Similarity.kmeansTrainMulti(emb, "vec_id", "embedding", 4, 8, 3)
    assert(history.length == 3)
    val n = history.head._3
    assert(history.forall(_._3 == n))
    for (j <- 0 until 4) {
      val sses = history.map(_._2(j))
      sses.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a + 1e-6, s"subspace $j SSE rose: $sses")
      }
    }
  }
}
