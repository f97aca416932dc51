package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Eval, Graph}

/** Unit coverage for the evaluation-metric operators (exact AUC /
  * confusion / calibration) and the weighted bounded-hop SSSP —
  * hand-computable fixtures plus brute-force twins and
  * partitioning-invariance pins (the aggregates must be exact under
  * any layout).
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def scoresDf(rows: Seq[(Long, Long)]) =
    rows.toDF("score_e6", "y")

  /** O(n²) reference AUC: (#(pos>neg) + ½#(ties)) / (n⁺·n⁻), as e6
    * floor — the definition aucExact's rank decomposition must equal.
    */
  private def bruteAucE6(rows: Seq[(Long, Long)]): Long = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    num2 * 1000000L / (2L * pos.size * neg.size)
  }

  test("aucExact: perfect, random-tied, and inverted separations") {
    // perfect: every positive above every negative
    val perfect = Seq((900000L, 1L), (800000L, 1L), (200000L, 0L),
      (100000L, 0L))
    val r1 = Eval.aucExact(scoresDf(perfect)).head()
    assert(r1.getAs[Long]("n_pos") == 2 && r1.getAs[Long]("n_neg") == 2)
    assert(r1.getAs[Long]("auc_e6") == 1000000L)
    // all tied at one value: midrank credit gives exactly 0.5
    val tied = Seq((500000L, 1L), (500000L, 0L), (500000L, 1L),
      (500000L, 0L))
    assert(Eval.aucExact(scoresDf(tied)).head().getAs[Long]("auc_e6")
      == 500000L)
    // inverted: every positive below every negative
    val inv = Seq((100000L, 1L), (900000L, 0L))
    assert(Eval.aucExact(scoresDf(inv)).head().getAs[Long]("auc_e6") == 0L)
  }

  test("aucExact equals the brute-force pair count on mixed data " +
    "and is partitioning-invariant") {
    // deterministic pseudo-random scores with heavy ties across the
    // bucket boundary (16384) so both window levels are exercised
    val rows = (0 until 257).map { i =>
      val s = (i * 2654435761L) % 97 * 1000L // 97 distinct, many ties
      val y = if ((i * 40503L) % 7 < 3) 1L else 0L
      (s, y)
    }
    val expect = bruteAucE6(rows)
    val got = Eval.aucExact(scoresDf(rows)).head().getAs[Long]("auc_e6")
    assert(got == expect, s"auc got $got expect $expect")
    val got7 = Eval.aucExact(scoresDf(rows).repartition(7))
      .head().getAs[Long]("auc_e6")
    assert(got7 == expect, "AUC must not depend on partitioning")
  }

  test("aucExact: single-class input yields NULL auc, not a crash") {
    val onlyPos = Seq((1L, 1L), (2L, 1L))
    val r = Eval.aucExact(scoresDf(onlyPos)).head()
    assert(r.getAs[Long]("n_neg") == 0 && r.isNullAt(r.fieldIndex("auc_e6")))
  }

  test("confusion: hand case incl. NULL-denominator metrics") {
    val df = Seq((1, 1), (1, 1), (1, 0), (0, 0), (0, 0), (0, 1))
      .toDF("y", "pred")
    val r = Eval.confusion(df).head()
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("fn") == 1 && r.getAs[Long]("tn") == 2)
    assert(r.getAs[Long]("acc_e6") == 666666L)
    assert(r.getAs[Long]("prec_e6") == 666666L)
    assert(r.getAs[Long]("rec_e6") == 666666L)
    assert(r.getAs[Long]("f1_e6") == 666666L)
    // Cohen's κ: num = 6·4 − (3·3 + 3·3) = 6, den = 36 − 18 = 18
    assert(r.getAs[Long]("kappa_num") == 6L &&
      r.getAs[Long]("kappa_den") == 18L &&
      r.getAs[Long]("kappa_e6") == 333333L)
    // an all-negative predictor: precision must be NULL, never 0/0
    val deg = Seq((1, 0), (0, 0)).toDF("y", "pred")
    val rd = Eval.confusion(deg).head()
    assert(rd.isNullAt(rd.fieldIndex("prec_e6")))
    assert(rd.getAs[Long]("rec_e6") == 0L)
    // perfectly anti-correlated: κ = −1 exactly, trunc-toward-zero
    // sign handling (Spark DIV vs DuckDB // diverge on negatives —
    // the |num| trick keeps both engines identical)
    val anti = Seq((1, 0), (0, 1)).toDF("y", "pred")
    val ra = Eval.confusion(anti).head()
    assert(ra.getAs[Long]("kappa_num") == -2L &&
      ra.getAs[Long]("kappa_e6") == -1000000L)
    // constant predictions AND labels: κ undefined → NULL (den = 0)
    val const = Seq((1, 1), (1, 1)).toDF("y", "pred")
    val rc = Eval.confusion(const).head()
    assert(rc.isNullAt(rc.fieldIndex("kappa_e6")))
  }

  test("prCurve: per-threshold confusion from one bounded-domain pass") {
    val df = scoresDf(Seq((900000L, 1L), (700000L, 0L), (600000L, 1L),
      (100000L, 0L)))
    val rows = Eval.prCurve(df, Seq(500000L, 800000L)).collect()
    assert(rows.length == 2)
    val lo = rows(0)
    assert(lo.getAs[Long]("thr_e6") == 500000L &&
      lo.getAs[Long]("tp") == 2 && lo.getAs[Long]("fp") == 1 &&
      lo.getAs[Long]("fn") == 0 && lo.getAs[Long]("tn") == 1 &&
      lo.getAs[Long]("prec_e6") == 666666L &&
      lo.getAs[Long]("rec_e6") == 1000000L)
    val hi = rows(1)
    assert(hi.getAs[Long]("thr_e6") == 800000L &&
      hi.getAs[Long]("tp") == 1 && hi.getAs[Long]("fp") == 0 &&
      hi.getAs[Long]("fn") == 1 && hi.getAs[Long]("tn") == 2 &&
      hi.getAs[Long]("prec_e6") == 1000000L &&
      hi.getAs[Long]("rec_e6") == 500000L)
    // a threshold above every score: nothing predicted positive →
    // precision NULL, recall 0
    val none = Eval.prCurve(df, Seq(999999L)).head()
    assert(none.isNullAt(none.fieldIndex("prec_e6")) &&
      none.getAs[Long]("rec_e6") == 0L)
  }

  test("calibration: bins partition the corpus, gap is exact") {
    val df = scoresDf(Seq((50000L, 0L), (150000L, 0L), (150000L, 1L),
      (999999L, 1L), (1000000L, 1L)))
    val rows = Eval.calibration(df).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 5)
    val b0 = rows.find(_.getAs[Long]("bin") == 0L).get
    assert(b0.getAs[Long]("n") == 1 && b0.getAs[Long]("pos_rate_e6") == 0)
    val b1 = rows.find(_.getAs[Long]("bin") == 1L).get
    assert(b1.getAs[Long]("n") == 2 &&
      b1.getAs[Long]("pos_rate_e6") == 500000L &&
      b1.getAs[Long]("mean_p_e6") == 150000L &&
      b1.getAs[Long]("gap_e6") == 350000L)
    // the 10⁶ boundary folds into the top bin (least(..., 9))
    val b9 = rows.find(_.getAs[Long]("bin") == 9L).get
    assert(b9.getAs[Long]("n") == 2)
  }

  test("Mmr.greedy: diversity beats redundant relevance, maxsim is " +
      "over the whole selected set, ties break by id") {
    // A (rel 9000) wins round 1 on pure relevance; B (8900) is a
    // near-copy of A (sim 9900) so diverse C (8000) beats it in round
    // 2; B lands third carrying its max sim to the selected set
    val rels = Map(1L -> 9000L, 2L -> 8900L, 3L -> 8000L)
    val sims = Map((2L, 1L) -> 9900L, (1L, 2L) -> 9900L,
      (3L, 1L) -> 0L, (1L, 3L) -> 0L, (2L, 3L) -> 0L, (3L, 2L) -> 0L)
    val got = graft.ops.Mmr.greedy(rels, (i, j) => sims((i, j)), k = 3)
    assert(got == Seq(
      (1, 1L, 9000L, 0L, 63000L),
      (2, 3L, 8000L, 0L, 56000L),
      (3, 2L, 8900L, 9900L, 32600L)), s"got: $got")
    // equal scores: the smaller id wins; k beyond the pool truncates
    val tied = graft.ops.Mmr.greedy(
      Map(5L -> 100L, 4L -> 100L), (_, _) => 0L, k = 9)
    assert(tied.map(_._2) == Seq(4L, 5L))
  }

  test("ssspBoundedHops: weighted shortcut beats fewer hops, " +
    "round bound respected") {
    // 1 →(10)→ 2, 1 →(1)→ 3 →(1)→ 2: the 2-hop path to 2 costs 2
    // 2 →(5)→ 4 chains; 5 is isolated from the seed
    val e = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 1L),
      (2L, 4L, 5L), (5L, 6L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val d3 = Graph.ssspBoundedHops(e, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 7L))
    // with one round, only direct edges relax: node 2 costs 10
    val d1 = Graph.ssspBoundedHops(e, seeds, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
    // partitioning invariance of the relaxation min-aggregates
    val d3p = Graph.ssspBoundedHops(e.repartition(5), seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3p == d3)
  }
}
