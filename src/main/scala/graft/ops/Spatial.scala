package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial joins over integer-coordinate points — the
  * banding pattern (MinHash bands, SimHash bands, FastSS
  * neighborhoods) applied to 2-D space: bucket by ⌊coord/D⌋, probe
  * the 3×3 cell neighborhood, verify with exact integer distance².
  * Candidates come from an EQUI-join on cell ids, so the work is
  * O(n · 9 · density) — never the n²/2 all-pairs — and completeness
  * is structural: |Δcoord| ≤ D ⇒ |Δcell| ≤ 1, so every within-D pair
  * lands in the probed neighborhood (a pair matches in exactly ONE
  * probe cell — the candidate's own — so no dedup is needed).
  *
  * Input contract: `pts` carries (id: long, x: long, y: long) with
  * non-negative coordinates. At 100 TB: cell size tracks the radius,
  * AQE handles hot cells, and the dedup_salted escalation applies
  * verbatim — this is the same operator shape.
  */
object Spatial {

  private def withCells(pts: DataFrame, d: Long): DataFrame =
    pts.select(col("id"), col("x"), col("y"))
      .withColumn("cx", expr(s"x DIV $d"))
      .withColumn("cy", expr(s"y DIV $d"))

  /** The 9-cell probe expansion (columns id_a/xa/ya + probe cell). */
  private def probes(src: DataFrame): DataFrame =
    src.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"),
        explode(typedLit(Seq(-1L, 0L, 1L))).as("dx"),
        col("cx"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("dx")).as("pcx"),
        explode(typedLit(Seq(-1L, 0L, 1L))).as("dy"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"), col("pcx"),
        (col("cy") + col("dy")).as("pcy"))

  private def dist2: Column =
    (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))

  /** Every unordered pair within Euclidean distance `d`:
    * (id_a < id_b, dist2).
    */
  def radiusPairs(pts: DataFrame, d: Long): DataFrame = {
    require(d > 0, s"radius must be positive, got $d")
    val cells = withCells(pts, d)
    probes(cells)
      .join(cells.select(col("id").as("id_b"), col("x").as("xb"),
          col("y").as("yb"), col("cx").as("pcx"), col("cy").as("pcy")),
        Seq("pcx", "pcy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2", dist2)
      .filter(col("dist2") <= lit(d * d))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }

  /** Bounded-radius k-nearest-neighbors for the rows matching
    * `queryPred`: (qid, nid, dist2, rnk ≤ k), EXACT within the
    * D-ball (the cell decomposition is complete for radius `d`),
    * ties by neighbor id.
    */
  def knnWithinRadius(pts: DataFrame, queryPred: Column, d: Long,
                      k: Int): DataFrame = {
    require(d > 0 && k > 0, s"need positive radius/k, got $d/$k")
    import org.apache.spark.sql.expressions.Window
    val cells = withCells(pts, d)
    val cands = probes(cells.filter(queryPred))
      .join(cells.select(col("id").as("nid"), col("x").as("xb"),
          col("y").as("yb"), col("cx").as("pcx"), col("cy").as("pcy")),
        Seq("pcx", "pcy"))
      .filter(col("id_a") =!= col("nid"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= lit(d * d))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("dist2"), col("nid"))
    cands.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("id_a").as("qid"), col("nid"), col("dist2"), col("rnk"))
  }
}
