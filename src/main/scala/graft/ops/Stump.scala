package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Depth-1 decision-tree TRAINING with exact integer Gini — the
  * second in-engine trainer family next to [[Classifier]]'s GD
  * (reference scope: the reference has no training; this extends the
  * surface the way the dedup/ANN families do). A stump over cheap
  * surface features is the classic first quality gate (and the weak
  * learner boosting stacks), and its search is embarrassingly
  * aggregable: every candidate split's evaluation is a pair of
  * conditional sums.
  *
  * Exactness discipline (the kmeans/GD conventions):
  *  - features quantize per-row to e6 int64 (floor(x·10⁶ + 0.5)) so
  *    the threshold comparisons are integer, not float;
  *  - a candidate (feature f, threshold t) splits rows into
  *    left = f_e6 ≤ t / right; its weighted Gini impurity
  *    2·pL·(nL−pL)/nL + 2·pR·(nR−pR)/nR is kept as the exact integer
  *    RATIONAL (gini_num = 2·pL·(nL−pL)·nR + 2·pR·(nR−pR)·nL,
  *    gini_den = nL·nR) — int64-safe while n³ < 2⁶³ (n ≲ 2·10⁶ rows;
  *    past that the same algebra rides DECIMAL(38,0));
  *  - the comparable score is score_e12 = ⌊num·10¹²/den⌋ (BigInt
  *    floordiv on non-negatives = trunc = DuckDB `//`), and the
  *    winner is the lexicographic min of (score_e12, feature,
  *    thr_e6) — fully deterministic, fully SQL-replayable.
  *
  * 100 TB shape: the WHOLE candidate search is ONE scan + ONE 1-row
  * aggregate of 2·|features|·|grid| + 2 int64 cells (74 here) with
  * map-side partial sums — the shuffle carries cells, never rows.
  * Driver state is the fixed candidate grid (a design constant),
  * same bounded-collect contract as the k-means codebooks.
  */
object Stump {

  /** Candidate thresholds on the e6 feature scale: the 9 interior
    * deciles — the [[Eval.prCurve]] grid, shared so the two searches
    * stay comparable.
    */
  val GridE6: Seq[Long] = (1L to 9L).map(_ * 100000L)

  private val Features = Seq("x1", "x2", "x3", "x4")

  /** Train over a [[Classifier.features]]-shaped frame
    * (x1..x4 double, y double 0/1). Returns one row per candidate:
    * (feature, thr_e6, n_left, pos_left, n_right, pos_right,
    * gini_num, gini_den, score_e12, chosen) ordered by
    * (feature, thr_e6); exactly one row has chosen = 1.
    */
  /** The whole candidate search as ONE 1-row aggregate — exposed so
    * PlanSpec can pin the scale shape (single scan, partial+final
    * HashAggregate, the shuffle carries 74 int64 cells, never rows);
    * [[train]]'s remaining work is driver arithmetic over this row.
    */
  def searchFrame(feat: DataFrame): DataFrame = {
    val e6 = Features.map(f =>
      floor(col(f) * lit(1e6) + lit(0.5)).cast("long").as(s"${f}_e6"))
    val yL = col("y").cast("long").as("yl")
    val q = feat.select(e6 :+ yL: _*)
    // one scan: nL/pL per candidate + global (n, p) — 74 int64 cells
    val aggs = (for {
      f <- Features; t <- GridE6
    } yield Seq(
      sum(when(col(s"${f}_e6") <= t, 1L).otherwise(0L))
        .as(s"nl_${f}_$t"),
      sum(when(col(s"${f}_e6") <= t, col("yl")).otherwise(0L))
        .as(s"pl_${f}_$t"))).flatten ++
      Seq(count(lit(1)).as("n"), sum(col("yl")).as("p"))
    q.agg(aggs.head, aggs.tail: _*)
  }

  def train(feat: DataFrame): DataFrame = {
    val s = feat.sparkSession
    val row = searchFrame(feat).head()
    val n = row.getAs[Long]("n")
    val p = row.getAs[Long]("p")
    require(n > 0, "stump training needs a non-empty corpus")
    val cand = for { f <- Features; t <- GridE6 } yield {
      val nL = row.getAs[Long](s"nl_${f}_$t")
      val pL = row.getAs[Long](s"pl_${f}_$t")
      val nR = n - nL
      val pR = p - pL
      val num = 2L * pL * (nL - pL) * nR + 2L * pR * (nR - pR) * nL
      val den = nL * nR
      // a degenerate split (one empty side) scores NULL and never wins
      val score: Option[Long] =
        if (den > 0) Some((BigInt(num) * BigInt(1000000000000L)
          / BigInt(den)).toLong)
        else None
      (f, t, nL, pL, nR, pR, num, den, score)
    }
    val winner = cand.filter(_._9.isDefined)
      .minByOption { case (f, t, _, _, _, _, _, _, sc) => (sc.get, f, t) }
      .map { case (f, t, _, _, _, _, _, _, _) => (f, t) }
    import s.implicits._
    cand.map { case (f, t, nL, pL, nR, pR, num, den, sc) =>
      (f, t, nL, pL, nR, pR, num, den, sc,
        if (winner.contains((f, t))) 1 else 0)
    }.toDF("feature", "thr_e6", "n_left", "pos_left", "n_right",
        "pos_right", "gini_num", "gini_den", "score_e12", "chosen")
      .orderBy(col("feature"), col("thr_e6"))
  }
}
