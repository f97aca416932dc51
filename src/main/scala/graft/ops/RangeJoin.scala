package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — the general form of the block-bucket trick used
  * by [[Dedup.ngramJaccardPairs]] and [[Similarity.embeddingNearDupPairs]]:
  * pairs of rows with the same key whose numeric ordinate differs by at
  * most `window`, WITHOUT a nested-loop theta join.
  *
  * `b = floor(v / window)`; a partner within (v, v + window] lives in
  * bucket b or b+1, so exploding the left side over {b, b+1} turns the
  * range predicate into an equi-join on (key, bucket) with the exact
  * range condition applied post-join. Candidates per row are O(rows in
  * two buckets) — at 100 TB the shuffle is the same size a plain keyed
  * join would be, and no partition ever sees the O(n²) cross product a
  * BroadcastNestedLoopJoin would evaluate.
  */
object RangeJoin {

  /** Self-join `df` on `keyCols`: emit (a, b) with
    * 0 < b.ordinal − a.ordinal ≤ window. Output columns:
    * keyCols, `<ordinalCol>_a`, `<ordinalCol>_b`, plus
    * `<c>_a`/`<c>_b` for every `carryCols` column.
    */
  def selfPairsWithin(df: DataFrame, keyCols: Seq[String],
                      ordinalCol: String, window: Long,
                      carryCols: Seq[String] = Seq.empty): DataFrame = {
    require(window > 0)
    val base = Dedup.spread(
      df.select((keyCols ++ Seq(ordinalCol) ++ carryCols).map(col): _*))
      .withColumn("__bucket", floor(col(ordinalCol) / window))

    def side(suffix: String, bucketExpr: DataFrame => DataFrame): DataFrame = {
      val renamed = (Seq(ordinalCol) ++ carryCols).foldLeft(base) {
        (d, c) => d.withColumnRenamed(c, s"${c}_$suffix")
      }
      bucketExpr(renamed)
    }

    val left = side("a", d => d
      .withColumn("__jb", explode(array(col("__bucket"), col("__bucket") + 1)))
      .drop("__bucket"))
    val right = side("b", d => d.withColumnRenamed("__bucket", "__jb"))

    // no dedup needed: for any pair, the right row's bucket equals
    // exactly one of the left row's two exploded buckets
    left.join(right, keyCols :+ "__jb")
      .filter(col(s"${ordinalCol}_b") > col(s"${ordinalCol}_a") &&
        col(s"${ordinalCol}_b") <= col(s"${ordinalCol}_a") + window)
      .drop("__jb")
  }
}
