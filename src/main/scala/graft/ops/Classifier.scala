package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier trained INSIDE the engine — the
  * CCNet/fastText-shaped quality-filter step of a training-data
  * pipeline (reference scope: the reference has no model training;
  * this extends the §2 surface the same way the dedup/ANN families
  * do): logistic regression over cheap surface features, fit by
  * full-batch gradient descent where each step is ONE distributed
  * aggregate.
  *
  * Everything is exactly replayable in SQL — the same discipline as
  * the r7 k-means trainer:
  *
  *  - features are per-row arithmetic (no cross-row state);
  *  - the sigmoid is the RATIONAL approximation
  *    σ(z) = 0.5 + 0.5·z/(1+|z|) — pure +,·,/,abs, bit-identical in
  *    any IEEE engine, where exp()'s last ulp differs across libms
  *    (hardware-friendly rational sigmoids are standard in quantized
  *    training for exactly this reason);
  *  - per-row gradient contributions quantize to e12 int64
  *    (floor(g·10¹² + 0.5)) and SUM as integers, so the reduction is
  *    shuffle-order-independent and the weight trajectory is
  *    bit-reproducible across partitionings and runs;
  *  - the weight update runs driver-side on d+1 cells per step (the
  *    bounded-driver-state shape of kmeansTrain).
  *
  * Scale: each GD step is one scan with map-side partial integer
  * sums — the shuffle carries (d+1)·partitions longs, never rows; at
  * 100 TB with d ≈ dozens this trains at the cost of `iters` scans,
  * and the scan can ride the same pass as other corpus statistics.
  */
object Classifier {

  /** σ(z) = 0.5 + 0.5·z/(1+|z|) as a column expression (the exact
    * arithmetic mirrored by the DuckDB oracle).
    */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** Surface quality features for a text column, per-row exact:
    * x0 = 1 (bias), x1 = min(chars, 2000)/2000, x2 = min(words,
    * 100)/100, x3 = stopword ratio ('the'/'a' over words), x4 = mean
    * word length / 10. Label y = 1 iff `langCol` = 'en' (the
    * lang-filter shape). Returns (id, x1..x4, y).
    */
  def features(df: DataFrame, idCol: String, textCol: String,
               langCol: String): DataFrame = {
    import graft.functions.dsl._
    val toks = tokens_lower(col(textCol))
    val nTok = size(toks)
    val stopCnt = size(filter(toks, t => t === "the" || t === "a"))
    val sumLen = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    df.select(col(idCol).as("id"),
      (least(length(col(textCol)), lit(2000)).cast("double") / 2000.0)
        .as("x1"),
      (least(nTok, lit(100)).cast("double") / 100.0).as("x2"),
      when(nTok > 0, stopCnt.cast("double") / nTok).otherwise(0.0)
        .as("x3"),
      when(nTok > 0, (sumLen.cast("double") / nTok) / 10.0).otherwise(0.0)
        .as("x4"),
      when(col(langCol) === "en", 1.0).otherwise(0.0).as("y"))
  }

  private val Dim = 5 // bias + 4 features

  /** z = w·x with the bias first, left-assoc fixed order (the oracle
    * mirrors the same association).
    */
  private def zExpr(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3") + lit(w(4)) * col("x4")

  /** Full-batch GD: `iters` steps at rate `lr` from w = 0. Returns
    * (weights, history of (iter, weights after step, sse_e12, n)) —
    * sse_e12 = Σ floor((p−y)²·10¹² + 0.5), the integer-exact squared
    * error the convergence gate asserts decreases.
    */
  /** ONE gradient step from `w` over `feat`: returns (updated
    * weights, sse_e12 measured AT `w`, row count). This is also the
    * online-learning primitive: stepping over a DELTA slice absorbs
    * an increment at cost ∝ |Δ| without rescanning the base corpus
    * (the incremental-family algebra applied to SGD).
    */
  /** The 1-row gradient aggregate at weights `w` — exposed so PlanSpec
    * can pin the scale shape: partial+final HashAggregate (map-side
    * combine), a shuffle of (d+2)·partitions int64 cells, never rows.
    */
  def gradientFrame(feat: DataFrame, w: Array[Double]): DataFrame = {
    val p = fastSigmoid(zExpr(w))
    val err = p - col("y")
    def g(x: Column): Column =
      sum(floor(err * x * lit(1e12) + lit(0.5)))
    feat.agg(g(lit(1.0)), g(col("x1")), g(col("x2")), g(col("x3")),
      g(col("x4")),
      sum(floor(err * err * lit(1e12) + lit(0.5))),
      count(lit(1)))
  }

  /** The gradient cells GROUPED — the data-parallel decomposition the
    * integer-cell design buys: G_j = Σ floor(err·x_j·10¹² + 0.5) is a
    * plain int64 SUM, so per-shard partial gradients accumulate to
    * the full-batch gradient EXACTLY (int addition is associative —
    * no float reduction-order drift), which is the algebra behind
    * gradient accumulation / data-parallel workers. Named columns so
    * consumers can sum/compare cells without positional access.
    */
  def gradientCells(feat: DataFrame, w: Array[Double],
                    by: Seq[Column]): DataFrame = {
    val p = fastSigmoid(zExpr(w))
    val err = p - col("y")
    def g(x: Column): Column =
      sum(floor(err * x * lit(1e12) + lit(0.5)).cast("long"))
    feat.groupBy(by: _*).agg(
      g(lit(1.0)).as("g0_e12"), g(col("x1")).as("g1_e12"),
      g(col("x2")).as("g2_e12"), g(col("x3")).as("g3_e12"),
      g(col("x4")).as("g4_e12"),
      sum(floor(err * err * lit(1e12) + lit(0.5)).cast("long"))
        .as("sse_e12"),
      count(lit(1)).as("n"))
  }

  def step(feat: DataFrame, w: Array[Double], lr: Double)
      : (Array[Double], Long, Long) = {
    val row = gradientFrame(feat, w).head()
    val n = row.getLong(Dim + 1)
    require(n > 0, "classifier training needs a non-empty corpus")
    val next = new Array[Double](Dim)
    var j = 0
    while (j < Dim) {
      // w_j − lr · ((G_j / 10¹²) / n), each op in this exact order
      next(j) = w(j) - lr * ((row.getLong(j) / 1e12) / n)
      j += 1
    }
    (next, row.getLong(Dim), n)
  }

  def train(feat: DataFrame, iters: Int, lr: Double)
      : (Array[Double], Seq[(Int, Array[Double], Long, Long)]) = {
    var w = Array.fill(Dim)(0.0)
    val history =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Double], Long, Long)]
    for (it <- 1 to iters) {
      val (next, sse, n) = step(feat, w, lr)
      w = next
      history += ((it, w.clone(), sse, n))
    }
    (w, history.toSeq)
  }

  /** Raw probabilities with trained weights: (id, y, p) where
    * p = σ(w·x) — the unrounded per-row exact arithmetic the
    * evaluation-metric queries quantize themselves (e6 keys for the
    * AUC rank decomposition, decile bins for calibration).
    */
  def probabilities(feat: DataFrame, w: Array[Double]): DataFrame =
    feat.select(col("id"), col("y").cast("long").as("y"),
      fastSigmoid(zExpr(w)).as("p"))

  /** Score rows with trained weights: p = σ(w·x), pred = p ≥ 0.5.
    * Per-row exact arithmetic over exact weights → replayable.
    */
  def score(feat: DataFrame, w: Array[Double]): DataFrame =
    feat.select(col("id"), col("y").cast("int").as("y"),
        fastSigmoid(zExpr(w)).as("p"))
      .select(col("id"), round(col("p"), 6).as("score_r"),
        when(col("p") >= 0.5, 1).otherwise(0).as("pred"), col("y"))
}
