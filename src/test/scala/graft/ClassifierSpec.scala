package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Classifier

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def feats = Classifier.features(
    Tables(spark, "/root/testdata/sf0.001", "documents"),
    "doc_id", "text", "lang")

  test("features are per-row exact and bounded") {
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (i <- 1 to 4) {
        val x = r.getDouble(i)
        assert(x >= 0.0 && x <= 2.0, s"feature $i out of band: $x")
      }
      assert(r.getDouble(5) == 0.0 || r.getDouble(5) == 1.0)
    }
  }

  test("training is bit-reproducible across partitionings (the " +
      "e12-int64 gradient-sum property)") {
    val (w1, h1) = Classifier.train(feats, iters = 3, lr = 0.5)
    val (w2, h2) = Classifier.train(feats.repartition(7), iters = 3, lr = 0.5)
    assert(w1.toSeq == w2.toSeq, "weights must be bit-identical")
    assert(h1.map(t => (t._1, t._3, t._4)) == h2.map(t => (t._1, t._3, t._4)))
  }

  test("GD makes progress: weights move and squared error decreases") {
    val (w, hist) = Classifier.train(feats, iters = 3, lr = 0.5)
    assert(w.exists(_ != 0.0), "weights never moved")
    val sses = hist.map(_._3)
    assert(sses == sses.sorted.reverse,
      s"sse_e12 must be non-increasing across steps: $sses")
  }

  test("online step: one delta-only gradient step equals the manual " +
      "update (the incremental-absorption primitive)") {
    import spark.implicits._
    val delta = Seq(
      (1L, 0.5, 0.2, 0.1, 0.4, 1.0),
      (2L, 0.9, 0.8, 0.0, 0.5, 0.0))
      .toDF("id", "x1", "x2", "x3", "x4", "y")
    val w0 = Array(0.1, -0.2, 0.3, 0.0, 0.05)
    val (w1, sse, n) = Classifier.step(delta, w0, lr = 0.5)
    assert(n == 2)
    // manual replication of the exact arithmetic
    val rows = Seq((0.5, 0.2, 0.1, 0.4, 1.0), (0.9, 0.8, 0.0, 0.5, 0.0))
    val contrib = rows.map { case (x1, x2, x3, x4, y) =>
      val z = w0(0) + w0(1) * x1 + w0(2) * x2 + w0(3) * x3 + w0(4) * x4
      val err = (0.5 + 0.5 * z / (1.0 + math.abs(z))) - y
      (Array(1.0, x1, x2, x3, x4).map(x =>
        math.floor(err * x * 1e12 + 0.5).toLong),
        math.floor(err * err * 1e12 + 0.5).toLong)
    }
    val g = Array.tabulate(5)(j => contrib.map(_._1(j)).sum)
    val wantW = Array.tabulate(5)(j => w0(j) - 0.5 * ((g(j) / 1e12) / 2))
    assert(w1.toSeq == wantW.toSeq, s"${w1.toSeq} vs ${wantW.toSeq}")
    assert(sse == contrib.map(_._2).sum)
  }

  test("score matches a manual per-row computation of the rational " +
      "sigmoid over the trained weights") {
    val (w, _) = Classifier.train(feats, iters = 3, lr = 0.5)
    val scored = Classifier.score(feats, w)
      .select("id", "score_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val manual = feats.collect().map { r =>
      val z = w(0) + w(1) * r.getDouble(1) + w(2) * r.getDouble(2) +
        w(3) * r.getDouble(3) + w(4) * r.getDouble(4)
      val p = 0.5 + 0.5 * z / (1.0 + math.abs(z))
      r.getLong(0) -> p
    }.toMap
    manual.foreach { case (id, p) =>
      assert(math.abs(scored(id) - p) < 5e-7, s"doc $id: ${scored(id)} vs $p")
    }
  }
}
