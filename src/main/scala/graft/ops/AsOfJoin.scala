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

  /** NEAREST as-of: each left row gains the right payload whose time
    * is CLOSEST in either direction for the same key — the
    * sensor-fusion / feature-attach shape (pandas `merge_asof`
    * direction='nearest'). Composition: the [[asofBackward]]
    * carry-forward pass plus a mirrored carry-BACK pass over the SAME
    * keyed union — Catalyst plans ONE hash exchange feeding two
    * in-partition sorts + Window nodes, so the cost stays one shuffle
    * of |L|+|R|, no range probe, no pair blowup.
    *
    * Resolution per left row is TOTAL and engine-independent:
    * min |Δt|, ties toward the EARLIER right time (the backward
    * candidate), then `tieCol` ASC — both carries keep the
    * min-`tieCol` member of an equal-time group, so an oracle can
    * replay the rule as ORDER BY (|Δt|, t, tie) LIMIT 1.
    *
    * Contracts: `timeCol` (same name both sides) and `tieCol` are
    * numeric; `tolerance` (same unit as `timeCol`) drops candidates
    * farther than the bound. Output: left columns + `asof_<payload>`
    * + `asof_t` (the matched right time, NULL when nothing qualifies).
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  timeCol: String, payloadCol: String, tieCol: String,
                  tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val leftCols = left.columns
    val out = s"asof_$payloadCol"
    val pType = right.schema(payloadCol).dataType
    val pStruct = StructType(Seq(StructField("t", LongType),
      StructField("tb", LongType), StructField("v", pType)))
    val l = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pStruct))
    val r = right
      .select(col(keyCol), col(timeCol), col(tieCol), col(payloadCol))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(col(timeCol).cast("long").as("t"),
        col(tieCol).cast("long").as("tb"), col(payloadCol).as("v")))
      .select(col(keyCol), col(timeCol), col("__side"), col("__p"))
    val unioned = l
      .select((leftCols.map(col) :+ col("__side") :+ col("__p")).toSeq: _*)
      .unionByName(r, allowMissingColumns = true)
    // tb DESC inside an equal-time group makes `last` carry the
    // MIN-tie member — the member the oracle's (|Δ|, t, tie ASC)
    // ordering selects; __side asc keeps equal-time rights visible
    val frame: org.apache.spark.sql.expressions.WindowSpec => Column =
      w => last(col("__p"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val wB = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc, col("__side").asc,
        col("__p").getField("tb").desc_nulls_first)
    val wF = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col("__side").asc,
        col("__p").getField("tb").desc_nulls_first)
    val tl = col(timeCol).cast("long")
    def delta(c: Column) = abs(c.getField("t") - tl)
    def inTol(c: Column) = tolerance
      .map(t => when(delta(c) <= t, c)).getOrElse(c)
    val withC = unioned
      .withColumn("__bv", inTol(frame(wB)))
      .withColumn("__fv", inTol(frame(wF)))
      .withColumn("__n",
        when(col("__bv").isNull, col("__fv"))
          .when(col("__fv").isNull, col("__bv"))
          .when(delta(col("__bv")) <= delta(col("__fv")), col("__bv"))
          .otherwise(col("__fv")))
    withC.filter(col("__side") === 1)
      .select((leftCols.map(col) :+
        col("__n").getField("v").as(out) :+
        col("__n").getField("t").as("asof_t")).toSeq: _*)
  }
}
