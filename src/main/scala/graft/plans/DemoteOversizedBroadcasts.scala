package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer safety net: strip `broadcast()` hints from relations
  * whose size estimate exceeds a bound.
  *
  * An unconditional broadcast hint is a latent scale bug: correct when
  * the hinted frame is small, an executor OOM once it grows with the
  * data (this library's ANN queries carried exactly that bug for two
  * rounds — a hinted query set that was 5% of the corpus). The
  * query-level fix is [[graft.ops.Hints.maybeBroadcast]]; this rule is
  * the cluster-level backstop for hints in user code the library
  * doesn't control: during optimization (where statistics are
  * available) any BROADCAST-strategy hint whose child's estimated size
  * exceeds `graft.broadcast.demoteBytes` (session conf, default 1 GiB
  * — far past any sane executor broadcast) is removed, and the planner
  * falls back to its normal join-strategy choice.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  * Estimates degrade CONSERVATIVELY without column stats (a filter
  * passes its child's size through), so real small dimensions — the
  * hints worth keeping — are unaffected, while corpus-sized frames are
  * demoted even when filtered.
  */
case class DemoteOversizedBroadcasts(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def maxBytes: BigInt = BigInt(
    spark.conf.get("graft.broadcast.demoteBytes", (1L << 30).toString).toLong)

  /** The marker Catalyst assigns to relations with NO statistics
    * (spark.sql.defaultSizeInBytes, default Long.MaxValue). A hint on
    * an unknown-size relation is precisely the case users write
    * broadcast() for — demoting it would invert the feature — so
    * unknown sizes are skipped, only KNOWN-oversized ones demoted.
    */
  private def unknownSize: BigInt = BigInt(
    spark.conf.get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString)
      .toLong)

  private def isBroadcastHint(h: HintInfo): Boolean =
    h.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST)

  // by the time injected optimizer rules run, EliminateResolvedHint
  // (first optimizer batch) has folded broadcast() hints into the Join
  // node's JoinHint — so the demotion matches Joins, not ResolvedHint
  private def demote(side: Option[HintInfo], child: LogicalPlan,
                     which: String): Option[HintInfo] = side match {
    case Some(h) if isBroadcastHint(h) && child.stats.sizeInBytes > maxBytes &&
        child.stats.sizeInBytes < unknownSize =>
      logWarning(s"demoting $which broadcast hint: estimated " +
        s"${child.stats.sizeInBytes} B exceeds graft.broadcast.demoteBytes=" +
        s"$maxBytes B — falling back to planner join selection")
      val stripped = h.copy(strategy = None)
      if (stripped == HintInfo()) None else Some(stripped)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case j @ Join(left, right, _, _, hint)
        if hint.leftHint.exists(isBroadcastHint) ||
          hint.rightHint.exists(isBroadcastHint) =>
      val newHint = JoinHint(
        demote(hint.leftHint, left, "left"),
        demote(hint.rightHint, right, "right"))
      if (newHint == hint) j else j.copy(hint = newHint)
  }
}
