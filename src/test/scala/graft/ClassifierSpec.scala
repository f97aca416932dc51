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

  test("Stump.train: perfect x1 split wins with score 0, tie broken " +
      "by (feature, thr); degenerate splits score NULL; " +
      "partitioning-invariant") {
    import spark.implicits._
    // x1 separates perfectly (0.05, 0.15 | 0.85, 0.95); x2..x4 are the
    // constant 0.5 → every one of their candidate splits is degenerate
    val f = Seq(
      (0.05, 0.5, 0.5, 0.5, 0.0), (0.15, 0.5, 0.5, 0.5, 0.0),
      (0.85, 0.5, 0.5, 0.5, 1.0), (0.95, 0.5, 0.5, 0.5, 1.0))
      .toDF("x1", "x2", "x3", "x4", "y")
    val rows = graft.ops.Stump.train(f).collect()
    assert(rows.length == 36)
    val chosen = rows.filter(_.getAs[Int]("chosen") == 1)
    assert(chosen.length == 1)
    val c = chosen.head
    // thresholds 200000..800000 all split x1 (2|2) with score 0; the
    // (feature, thr) tiebreak picks the smallest
    assert(c.getAs[String]("feature") == "x1" &&
      c.getAs[Long]("thr_e6") == 200000L &&
      c.getAs[Long]("n_left") == 2 && c.getAs[Long]("pos_left") == 0 &&
      c.getAs[Long]("score_e12") == 0L)
    // x1 @ 100000: (1|3) with one positive-side impurity:
    // num = 2·0·1·3 + 2·2·1·1 = 4, den = 3, score = ⌊4e12/3⌋
    val t1 = rows.find(r => r.getAs[String]("feature") == "x1" &&
      r.getAs[Long]("thr_e6") == 100000L).get
    assert(t1.getAs[Long]("gini_num") == 4 &&
      t1.getAs[Long]("gini_den") == 3 &&
      t1.getAs[Long]("score_e12") == 1333333333333L)
    // the constant features: 500000 puts all 4 left → den 0, NULL
    val deg = rows.find(r => r.getAs[String]("feature") == "x2" &&
      r.getAs[Long]("thr_e6") == 500000L).get
    assert(deg.getAs[Long]("gini_den") == 0 &&
      deg.isNullAt(deg.fieldIndex("score_e12")))
    assert(rows.filter(r => r.getAs[String]("feature") != "x1")
      .forall(r => r.isNullAt(r.fieldIndex("score_e12"))))
    // the one-scan aggregate must be layout-independent
    val rp = graft.ops.Stump.train(f.repartition(7)).collect()
    assert(rp.map(_.toString).sorted.toSeq ==
      rows.map(_.toString).sorted.toSeq)
  }
}
