package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 moved Column to a ColumnNode representation
  * and made the Expression⇄Column converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so extension
  * libraries provide this one-file shim inside the sql package — the
  * same pattern Spark-native extensions (Delta, Sedona, …) use.
  */
object GraftColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an EXISTING session (the
    * FunctionRegistry is `private[sql]`; new sessions should use
    * `graft.GraftExtensions` instead).
    */
  def registerFunction(spark: org.apache.spark.sql.classic.SparkSession,
                       name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
