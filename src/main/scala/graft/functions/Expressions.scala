package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{GraftColumnShim => ExpressionUtils}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the scale operators (SURVEY.md §7.2
  * phase 4). Native expressions, not UDFs: they participate in
  * whole-stage codegen via `defineCodeGen` (the generated code calls a
  * static [[Kernels]] method — no boxing, no Scala closure dispatch),
  * and null handling is inherited from Unary/BinaryExpression.
  */

/** MinHash signature of an array<long> of token/shingle hashes. */
case class MinHashSigExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.minhash(input.asInstanceOf[ArrayData], numHashes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.minhash($c, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash of an array<long> of token hashes. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** Cosine similarity of two array<float> vectors (double result). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Dot product of two array<float> vectors (double result). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Signed-random-projection LSH bucket id for an array<float>. */
case class SrpBucketExpr(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Kernels.srpBucket(input.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.srpBucket($c, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SrpBucketExpr =
    copy(child = c)
  override def prettyName: String = "srp_bucket"
}

/** Column-level API over the custom expressions — import
  * `graft.functions.dsl._` alongside `org.apache.spark.sql.functions._`.
  */
object dsl {
  val DefaultSeed = 42L

  def minhash_sig(c: Column, numHashes: Int, seed: Long = DefaultSeed): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(c), numHashes, seed))

  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(c)))

  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def srp_bucket(c: Column, bits: Int, seed: Long = DefaultSeed): Column =
    ExpressionUtils.column(
      SrpBucketExpr(ExpressionUtils.expression(c), bits, seed))
}
