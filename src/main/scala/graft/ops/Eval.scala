package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics for the in-engine quality classifier (and
  * any other scorer that emits a probability + binary label) — the
  * measurement half of a training-data pipeline's quality gate. The
  * reference has no model surface at all (SURVEY §2; its scope ends at
  * ETL), so this family extends the engine the same way the
  * classifier/dedup/ANN operators do: every metric is exact integer
  * arithmetic over one or two distributed aggregates, fully replayable
  * in SQL.
  *
  * Design constraints shared by all three operators:
  *
  *  - NO global sort and NO single-reducer full-table window. The AUC
  *    rank decomposition quantizes scores to e6 integers first, which
  *    bounds the rank domain at 10⁶+1 DISTINCT values regardless of
  *    corpus size — per-value counts are one hash aggregate, and the
  *    global cumulative count is the dsir_select/pack_sequences
  *    two-level prefix sum (within-bucket windows over ≤16384-value
  *    partitions plus one ≤62-row bucket-offset window).
  *  - Exact integers end to end: midranks carry the classic ×2 trick
  *    (rank2 = 2·cum_before + cnt + 1 — integral even for tied
  *    half-ranks), rank-sum products ride in DECIMAL(38,0) because
  *    Σ pos·rank2 reaches n² (int64 dies past ~3·10⁹ rows), and every
  *    reported ratio is a ×10⁶ integer floor division.
  *  - Shuffle economics: AUC shuffles (a) one (score_e6, cnt, pos)
  *    row per distinct quantized score ≤ 10⁶+1 and (b) tiny bucket
  *    tables; confusion and calibration shuffle 4 and ≤10 cells per
  *    partition respectively. All three are corpus-size-independent
  *    past the first map stage.
  */
object Eval {

  /** Exact ROC AUC of a quantized score column against a binary label
    * via the Mann–Whitney rank-sum. Input: (score_e6: long ascending
    * = better, y: 0/1 long). Output 1 row:
    * (n_pos, n_neg, auc_e6) where auc_e6 = ⌊AUC·10⁶⌋ with standard
    * midrank half-credit for ties — AUC·2·n⁺·n⁻ = Σ_v pos_v·rank2_v
    * − n⁺(n⁺+1), all integral. NULL auc_e6 iff a class is absent.
    */
  def aucExact(scores: DataFrame): DataFrame = {
    val byVal = scores.groupBy(col("score_e6"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      .withColumn("bkt", expr("score_e6 DIV 16384"))
    // two-level global cumulative count over the value domain: the
    // within-bucket window partitions on bkt (≤16384 values each);
    // the bucket-offset window runs over ≤62 rows — both bounded by
    // the e6 quantization, never by corpus size
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("score_e6"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byVal.groupBy(col("bkt"))
      .agg(sum(col("cnt")).as("bn"))
      .withColumn("offs",
        coalesce(sum(col("bn")).over(Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("offs"))
    val ranked = byVal
      .withColumn("cum_in", coalesce(sum(col("cnt")).over(wIn), lit(0L)))
      .join(broadcast(offsets), "bkt")
      // 2× midrank of every row tied at this value (ascending ranks)
      .withColumn("rank2",
        expr("CAST(2 * (offs + cum_in) + cnt + 1 AS DECIMAL(38,0))"))
    ranked
      .agg(sum(col("pos")).as("np"),
        sum(col("cnt") - col("pos")).as("nn"),
        sum(expr("CAST(pos AS DECIMAL(38,0)) * rank2")).as("prs2"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        expr("""CASE WHEN np > 0 AND nn > 0 THEN
                  CAST((prs2 - CAST(np AS DECIMAL(38,0)) * (np + 1))
                       * 1000000
                       DIV (2 * CAST(np AS DECIMAL(38,0)) * nn)
                       AS BIGINT)
                END""").as("auc_e6"))
  }

  /** 0.5-threshold confusion matrix + derived exact-e6 metrics from
    * ONE 1-row aggregate (four conditional sums — the shuffle is 4
    * longs per partition at any corpus size). Input: (y: int 0/1,
    * pred: int 0/1). Degenerate denominators (a class or a prediction
    * side absent) surface as NULL, never a fabricated 0.
    *
    * Cohen's κ (chance-corrected agreement) rides along as exact
    * integers: κ = (n·(tp+tn) − peN) / (n² − peN) with
    * peN = (tp+fp)(tp+fn) + (fp+tn)(fn+tn). The numerator can be
    * NEGATIVE (worse-than-chance), and Spark's `DIV` truncates toward
    * zero where DuckDB's `//` floors — so κ_e6 divides |num| and
    * re-applies the sign (identical in both engines), and num/den
    * are also emitted raw, the modularity no-division discipline.
    * n² bounds the int64 range at ~3·10⁹ rows — the same DECIMAL
    * widening path as [[aucExact]]'s rank products applies past that.
    */
  def confusion(scored: DataFrame): DataFrame =
    scored
      .agg(sum(expr("y * pred")).as("tp"),
        sum(expr("(1 - y) * pred")).as("fp"),
        sum(expr("y * (1 - pred)")).as("fn"),
        sum(expr("(1 - y) * (1 - pred)")).as("tn"))
      .withColumn("kappa_num", expr(
        """(tp + fp + fn + tn) * (tp + tn)
           - ((tp + fp) * (tp + fn) + (fp + tn) * (fn + tn))"""))
      .withColumn("kappa_den", expr(
        """(tp + fp + fn + tn) * (tp + fp + fn + tn)
           - ((tp + fp) * (tp + fn) + (fp + tn) * (fn + tn))"""))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(tp + tn) * 1000000 DIV (tp + fp + fn + tn)").as("acc_e6"),
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 DIV (tp + fp) END")
          .as("prec_e6"),
        expr("CASE WHEN tp + fn > 0 THEN tp * 1000000 DIV (tp + fn) END")
          .as("rec_e6"),
        expr("""CASE WHEN 2 * tp + fp + fn > 0 THEN
                  2 * tp * 1000000 DIV (2 * tp + fp + fn) END""")
          .as("f1_e6"),
        col("kappa_num"), col("kappa_den"),
        expr("""CASE WHEN kappa_den > 0 THEN
                  (CASE WHEN kappa_num < 0 THEN -1 ELSE 1 END)
                  * (abs(kappa_num) * 1000000 DIV kappa_den) END""")
          .as("kappa_e6"))

  /** Precision/recall curve points for a list of score thresholds
    * from ONE pass: aggregate the corpus to per-distinct-score
    * (cnt, pos) rows (the aucExact value domain, ≤10⁶+1 rows at any
    * corpus size), then take every threshold's (tp, fp) as a pair of
    * conditional sums in a SINGLE aggregate over that domain — the
    * whole curve costs one corpus scan plus one bounded-domain
    * aggregate, where the naive form rescans the corpus per
    * threshold. fn/tn derive from the totals; precision NULL when a
    * threshold fires on nothing. Input: (score_e6: long, y: 0/1
    * long); thresholds in e6 units, emitted as `thr_e6` rows.
    */
  def prCurve(scores: DataFrame, thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "prCurve needs at least one threshold")
    val byVal = scores.groupBy(col("score_e6"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(sum(when(col("score_e6") >= t, col("pos")).otherwise(0L))
          .as(s"tp_$i"),
        sum(when(col("score_e6") >= t, col("cnt") - col("pos"))
          .otherwise(0L)).as(s"fp_$i"))
    } ++ Seq(sum(col("pos")).as("np"),
      sum(col("cnt") - col("pos")).as("nn"))
    val one = byVal.agg(aggs.head, aggs.tail: _*)
    val stackArgs = thresholds.zipWithIndex
      .map { case (t, i) => s"${t}L, tp_$i, fp_$i" }.mkString(", ")
    one.select(
        expr(s"stack(${thresholds.size}, $stackArgs) AS (thr_e6, tp, fp)"),
        col("np"), col("nn"))
      .select(col("thr_e6"), col("tp"), col("fp"),
        (col("np") - col("tp")).as("fn"),
        (col("nn") - col("fp")).as("tn"),
        expr("CASE WHEN tp + fp > 0 THEN tp * 1000000 DIV (tp + fp) END")
          .as("prec_e6"),
        expr("CASE WHEN np > 0 THEN tp * 1000000 DIV np END")
          .as("rec_e6"))
      .orderBy(col("thr_e6"))
  }

  /** Reliability (calibration) table: scores binned into deciles
    * (bin = min(score_e6 div 10⁵, 9)), per-bin support, mean predicted
    * probability and empirical positive rate as exact ×10⁶ integers —
    * the ECE ingredients without a single float mean — plus the signed
    * gap. Input: (score_e6: long, y: 0/1 long). One hash aggregate
    * over a ≤10-value domain. Σ score_e6 stays in int64 up to 9.2·10¹²
    * rows per bin; past that the sum column widens to DECIMAL the way
    * aucExact's rank products do.
    */
  def calibration(scores: DataFrame): DataFrame =
    scores
      .groupBy(expr("least(score_e6 DIV 100000, 9)").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("score_e6")).as("s6"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("s6 DIV n").as("mean_p_e6"),
        expr("n_pos * 1000000 DIV n").as("pos_rate_e6"),
        expr("n_pos * 1000000 DIV n - s6 DIV n").as("gap_e6"))
      .orderBy(col("bin"))
}
