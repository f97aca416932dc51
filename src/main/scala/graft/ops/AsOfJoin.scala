package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left ("query") row, attach the most recent
  * right ("quote") row with the same key and time ≤ the query time.
  *
  * Spark has no built-in as-of join; the scalable composition (per the
  * preference order: compose built-ins before custom plans) is the
  * union + carry-forward trick rather than a range join:
  *
  *   1. union both sides tagged, with the right side's payload
  *   2. one window sort per key over the union
  *   3. `last(payload, ignoreNulls)` carried forward over the frame
  *   4. keep the left rows
  *
  * Cost: ONE shuffle+sort of |L|+|R| — no join explosion, no
  * per-row range probe, skew bounded by the hottest key (AQE).
  * A range join would shuffle the same data AND risk O(|L|·|R|)
  * within-key pair blowup; the window form is strictly better at
  * 100 TB unless keys are so hot that a single key exceeds a
  * partition, which is the documented salting escalation.
  *
  * Tie semantics: right rows at exactly the query time ARE visible
  * (≤). Among right rows with equal time, the one latest in
  * `tieBreak` order wins — pass a unique column for determinism.
  */
object AsOfJoin {

  /** `left` gains `asof_<payloadCol>`: the latest right `payloadCol`
    * at or before the left row's time, or NULL if none.
    *
    * Both frames must expose `keyCol` and `timeCol` under the same
    * names; `payloadCol` must exist on the right.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   keyCol: String, timeCol: String, payloadCol: String,
                   tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    val out = s"asof_$payloadCol"

    // __side: right=0 sorts before left=1 at equal time, so a quote at
    // exactly the query time is visible to the query (inclusive ≤)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        right.schema(payloadCol).dataType))
    // contract: payloadCol must not collide with a left column name
    val r = right.select(
        (Seq(col(keyCol), col(timeCol), col(payloadCol)) ++
          tieBreak.filterNot(_ == payloadCol).map(col)).distinct: _*)
      .withColumn("__side", lit(0))
      .withColumn("__payload", col(payloadCol))

    val unioned = l.select(
      (leftCols.map(col) :+ col("__side") :+ col("__payload")).toSeq: _*)
      .unionByName(r, allowMissingColumns = true)

    val ordering: Seq[Column] =
      Seq(col(timeCol).asc, col("__side").asc) ++
        tieBreak.map(c => col(c).asc_nulls_first)
    val w = Window.partitionBy(col(keyCol)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn(out, last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) :+ col(out)).toSeq: _*)
  }
}
