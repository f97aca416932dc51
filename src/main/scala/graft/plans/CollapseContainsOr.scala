package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Contains, Expression,
  GreaterThan, Literal, Or, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AcMatchIdsExpr

/** Optimizer rewrite: a disjunction of `contains(c, 'p1') OR
  * contains(c, 'p2') OR …` over the SAME column with literal needles
  * collapses into ONE Aho–Corasick pass —
  * `size(ac_match_ids(c, [p1…pn])) > 0`.
  *
  * This is the declarative face of [[graft.functions.AhoCorasick]]:
  * users (and generated SQL) write the natural per-pattern predicate;
  * the engine makes it scale. The naive chain costs O(P·n) per row
  * and grows the codegen'd predicate linearly with P (past a few
  * hundred terms it stops JIT-compiling at all); the rewrite is
  * O(n + matches) per row with P only in the automaton build, which
  * happens once on the driver.
  *
  * Eligibility is strict so the rewrite can never change semantics:
  * every leaf of the Or-tree must be a `Contains` whose left side is
  * semantically the SAME expression and whose right side is a
  * non-empty foldable string literal, and there must be at least
  * `graft.ac.rewriteMinTerms` of them (default 4 — below that the
  * chain is as good). NULL behaviour is preserved: with a null
  * column every Contains is null so the Or is null; the rewritten
  * `ac_match_ids` is null-intolerant and `size(null) > 0` is null.
  * Short-circuit value is preserved because the automaton pass stops
  * early once every pattern has matched.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`
  * (extended operator-optimization batch — before scan pushdown,
  * which is indifferent here: Spark pushes no contains() predicate
  * to parquet, so the chain would have run post-scan anyway).
  */
case class CollapseContainsOr(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def minTerms: Int =
    spark.conf.get("graft.ac.rewriteMinTerms", "4").toInt

  /** The Or-tree as (column, needles) iff EVERY leaf is eligible. */
  private def collect(e: Expression): Option[(Expression, Vector[String])] =
    e match {
      case Or(l, r) =>
        for {
          (cl, pl) <- collect(l)
          (cr, pr) <- collect(r)
          if cl.semanticEquals(cr)
        } yield (cl, pl ++ pr)
      case Contains(c, Literal(p: UTF8String, StringType))
          if p.numBytes() > 0 =>
        Some((c, Vector(p.toString)))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case or @ Or(_, _) =>
        collect(or) match {
          case Some((c, pats)) if pats.size >= minTerms =>
            // legacySizeOfNull pinned false: under the legacy session
            // conf size(null) = -1 and the rewrite would turn a NULL
            // OR-chain (NULL) into false in projection contexts —
            // NULL-in → NULL-out must hold under ANY session config
            GreaterThan(
              Size(AcMatchIdsExpr(c, pats), legacySizeOfNull = false),
              Literal(0))
          case _ => or
        }
    }
}
