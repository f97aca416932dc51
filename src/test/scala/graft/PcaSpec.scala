package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("power iteration reaches the exact eigenvector of a rank-1 " +
      "covariance: vectors ±(0.5, 0.1) give C = 4·outer((5e5,1e5)), " +
      "whose eigendirection (5,1) is the e6 fixed point (1e6, 2e5)") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0.5f, 0.1f)), (2L, Seq(-0.5f, -0.1f)),
      (3L, Seq(0.5f, 0.1f)), (4L, Seq(-0.5f, -0.1f)))
      .toDF("vec_id", "embedding")
    val (mu, traj) = Pca.train(emb, "vec_id", "embedding", iters = 3)
    assert(mu.toSeq == Seq(0L, 0L))
    // iter 1 already lands on the eigendirection (the start vector is
    // not orthogonal to it) and iters 2, 3 must stay there exactly
    traj.foreach(v => assert(v.toSeq == Seq(1000000L, 200000L),
      s"trajectory step was ${v.toSeq}"))
  }

  test("covCells is partitioning-invariant (integer sums commute) and " +
      "emits the exact upper triangle") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(0.5f, 0.1f)), (2L, Seq(-0.5f, -0.1f)),
      (3L, Seq(0.5f, 0.1f)), (4L, Seq(-0.5f, -0.1f)))
      .toDF("vec_id", "embedding")
    def cells(df: org.apache.spark.sql.DataFrame) =
      Pca.covCells(Pca.quantized(df, "vec_id", "embedding"),
          Array(0L, 0L))
        .orderBy("i", "j").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val got = cells(emb)
    assert(got == Seq((0, 0, 1000000000000L), (0, 1, 200000000000L),
      (1, 1, 40000000000L)))
    assert(cells(emb.repartition(5)) == got,
      "partial-aggregate merge order must not perturb integer cells")
  }

  test("project truncates toward zero on NEGATIVE dot products " +
      "(Spark DIV = BigInt / = DuckDB //), and centers by mu") {
    import spark.implicits._
    // mu = (1e6, 0); centered first vector = (-5e5, 1e5): praw with
    // v = (1e6, 2e5) is -5e11 + 2e10 = -4.8e11 → proj_e6 = -480000
    // (exactly divisible); the second vector uses v = (3, 1e5) on
    // centered (5e5, -1e5) giving praw = 15e5 - 1e10 → trunc toward
    // zero of -9998500000/1e6 = -9998 (floor would be -9999)
    val emb = Seq(
      (1L, Seq(0.5f, 0.1f)), (2L, Seq(1.5f, -0.1f)))
      .toDF("vec_id", "embedding")
    val mu = Array(1000000L, 0L)
    val got = Pca.project(emb, "vec_id", "embedding", mu,
        Array(1000000L, 200000L))
      .orderBy("vec_id").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(-480000L, 480000L))
    val gotTrunc = Pca.project(emb, "vec_id", "embedding", mu,
        Array(3L, 100000L))
      .orderBy("vec_id").collect().map(_.getLong(1)).toSeq
    assert(gotTrunc == Seq(9998L, -9998L),
      "DIV must truncate toward zero, not floor")
  }

  test("empty inputs fail LOUDLY (trainers) — no silent zero-row " +
      "models") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Pca.train(empty, "vec_id", "embedding", iters = 1)
    }
    assert(e1.getMessage.contains("empty corpus"), e1.getMessage)
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Graph.hitsE6(emptyEdges, iters = 1).collect()
    }
    assert(e2.getMessage.contains("empty edge set"), e2.getMessage)
  }

  test("VectorStatsAgg rejects a mid-stream vector-length change " +
      "instead of corrupting the packed buffer") {
    val agg = new graft.functions.VectorStatsAgg
    val b = agg.reduce(agg.zero, Seq(1L, 2L))
    val e = intercept[IllegalArgumentException] {
      agg.reduce(b, Seq(1L, 2L, 3L))
    }
    assert(e.getMessage.contains("vector length changed"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      agg.merge(b, agg.reduce(agg.zero, Seq(1L)))
    }
    assert(e2.getMessage.contains("different dims"), e2.getMessage)
  }

  test("isqrt is exact at perfect-square boundaries and at the e12 " +
      "variance scale") {
    for (s <- Seq(0L, 1L, 2L, 3L, 999999L, 1000000L, 1224744L,
        35000000L)) {
      val sq = s * s
      assert(Pca.isqrt(sq) == s, s"isqrt($sq)")
      if (sq > 0) assert(Pca.isqrt(sq - 1) == s - 1, s"isqrt(${sq - 1})")
      if (s > 0) {
        assert(Pca.isqrt(sq + 1) == s, s"isqrt(${sq + 1})")
        assert(Pca.isqrt(sq + 2 * s) == s,
          s"isqrt(${sq + 2 * s}) — last value before the next square")
      }
    }
  }

  test("deflated power iteration lands near-orthogonal to v1 on a " +
      "two-direction corpus and picks up the second direction's sign " +
      "structure") {
    import spark.implicits._
    // dominant direction (5, 1) (points ±(0.5, 0.1) twice), secondary
    // (-1, 5) at lower variance (points ±(-0.02, 0.10))
    val emb = Seq(
      (1L, Seq(0.5f, 0.1f)), (2L, Seq(-0.5f, -0.1f)),
      (3L, Seq(0.5f, 0.1f)), (4L, Seq(-0.5f, -0.1f)),
      (5L, Seq(-0.02f, 0.10f)), (6L, Seq(0.02f, -0.10f)))
      .toDF("vec_id", "embedding")
    val stats = Pca.rawStatsFused(Pca.quantized(emb, "vec_id", "embedding"))
    val (mu, _) = Pca.momentsFromStats(stats)
    val cov = Pca.covFromStats(stats, mu)
    val v1 = Pca.powerTrajectory(cov, 3).last
    val u = Pca.powerTrajectoryDeflated(cov, v1, 3).last
    // exact-integer orthogonality bound: cos²(u, v1) ≤ 1%
    val dot = u.indices.map(i => BigInt(u(i)) * v1(i)).sum
    val u2 = u.map(x => BigInt(x) * x).sum
    val v2 = v1.map(x => BigInt(x) * x).sum
    assert(dot * dot * 100 <= u2 * v2,
      s"u=$u v1=${v1.toSeq} not near-orthogonal")
    // the second direction must oppose signs (the (-1, 5) structure)
    assert(u(0).sign != u(1).sign, s"u=${u.toSeq}")
  }

  test("rawStats are purely additive: base + delta equals the full " +
      "corpus cell-for-cell, and the scaled covariance keeps the " +
      "rank-1 eigendirection") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(0.5f, 0.1f)), (2L, Seq(-0.5f, -0.1f)),
      (3L, Seq(0.5f, 0.1f)), (9L, Seq(-0.5f, -0.1f)))
    val full = rows.toDF("vec_id", "embedding")
    val base = rows.filter(_._1 % 10 != 9).toDF("vec_id", "embedding")
    val delta = rows.filter(_._1 % 10 == 9).toDF("vec_id", "embedding")
    def st(df: org.apache.spark.sql.DataFrame) =
      Pca.rawStats(Pca.quantized(df, "vec_id", "embedding"))
    val merged = Pca.mergeStats(st(base), st(delta))
    val whole = st(full)
    assert(merged._1 == whole._1)
    assert(merged._2.toSeq == whole._2.toSeq)
    assert(merged._3.map(_.toSeq).toSeq == whole._3.map(_.toSeq).toSeq,
      "uncentered products must merge exactly")
    // same ±(0.5, 0.1) corpus as the covCells test: zero mean, so
    // n·P − S·Sᵀ = n·P is n× the covariance — same (1e6, 2e5) fixed
    // point under max-norm power iteration
    val traj = Pca.powerTrajectory(Pca.scaledCov(merged), iters = 2)
    traj.foreach(v => assert(v.toSeq == Seq(1000000L, 200000L),
      s"scaled-cov trajectory step was ${v.toSeq}"))
  }

  test("rawStatsFused (one-pass custom aggregate) equals the exploded " +
      "path cell-for-cell on real data, and the derived centered " +
      "covariance equals covCells' distributed sums") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val xe = Pca.quantized(emb, "vec_id", "embedding")
    val fused = Pca.rawStatsFused(xe)
    val exploded = Pca.rawStats(xe)
    assert(fused._1 == exploded._1)
    assert(fused._2.toSeq == exploded._2.toSeq)
    assert(fused._3.map(_.toSeq).toSeq == exploded._3.map(_.toSeq).toSeq,
      "fused products must equal exploded products")
    // the identity Σ(xi−mi)(xj−mj) = Pij − miSj − mjSi + n·mimj must
    // reproduce the distributed centered sums EXACTLY
    val (mu, _) = Pca.momentsFromStats(fused)
    assert(mu.toSeq == Pca.meansE6(xe).toSeq)
    val cov = Pca.covFromStats(fused, mu)
    Pca.covCells(xe, mu).collect().foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(cov(i)(j) == BigInt(s), s"cell ($i,$j)")
    }
    // and the variance diagonal must match the exploded variance op
    val (_, vn) = Pca.momentsFromStats(fused)
    assert(vn.toSeq == Pca.varianceE12(xe, mu).toSeq)
  }

  test("standardize: hand z-scores incl. a constant (sd = 0) " +
      "dimension and negative truncation") {
    import spark.implicits._
    // dim0: values ±0.5 → mu = 0, vn = 25e10, sd = 500000;
    //   z = ±(5e5·1e6)/5e5 = ±1000000
    // dim1: constant 0.25 → sd = 0 → z = 0
    // dim2: values 0.3, 0.0, 0.0 → mu = 1e5, c = (2e5, -1e5, -1e5),
    //   vn = (4e10+1e10+1e10)/3 = 2e10, sd = isqrt = 141421,
    //   z = 2e11/141421 = 1414214 (trunc), -1e11/141421 = -707108
    val emb = Seq(
      (1L, Seq(0.5f, 0.25f, 0.3f)), (2L, Seq(-0.5f, 0.25f, 0.0f)),
      (3L, Seq(0.5f, 0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
    val xe = Pca.quantized(emb, "vec_id", "embedding")
    val mu = Pca.meansE6(xe)
    // mu dim0: (5e5 - 5e5 + 5e5)/3 = 166666 (trunc)
    assert(mu.toSeq == Seq(166666L, 250000L, 100000L))
    val sd = Pca.varianceE12(xe, mu).map(Pca.isqrt)
    assert(sd(1) == 0L, "constant dimension must have sd 0")
    val got = Pca.standardize(emb, "vec_id", "embedding", mu, sd)
      .orderBy("vec_id", "d").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every constant-dim z is 0; others are finite and truncated
    assert(got.filter(_._2 == 1).forall(_._3 == 0L))
    val z2 = got.filter(_._2 == 2).map(_._3).toSeq
    assert(z2(1) < 0 && z2(0) > 0, s"signs: $z2")
    // replay the dim-2 arithmetic by hand against the operator
    val c2 = Seq(300000L - 100000L, -100000L, -100000L)
    val vn2 = c2.map(c => c * c).sum / 3
    val sd2 = Pca.isqrt(vn2)
    assert(z2 == c2.map(c => c * 1000000L / sd2),
      s"dim-2 z-scores: $z2")
  }
}
