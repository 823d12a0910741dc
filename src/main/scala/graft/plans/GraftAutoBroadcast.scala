package graft.plans

import graft.sources.GraftV1Scan
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** AUTO-BROADCAST for graft DSv2 reads: Spark's join planning reads
  * the optimized plan's statistics, but a `V1Scan` is wrapped in
  * `V1ScanWrapper` during pushdown and the wrapper does not forward
  * `SupportsReportStatistics` — so every format-read graft dim
  * defaults to an effectively-infinite size estimate and every join
  * against it plans as a shuffle, no matter how small the dim. At
  * 100 TB that is the difference between a map-side broadcast join
  * and a full fact shuffle.
  *
  * This rule closes the gap at the level Spark leaves open: when a
  * join side is a bare graft scan (projections/filters only —
  * `PhysicalOperation`) whose MANIFEST-derived size
  * ([[GraftV1Scan.estimateStatistics]] — real file bytes, a driver
  * metadata walk) is under `spark.sql.autoBroadcastJoinThreshold`,
  * the join gets the same `BROADCAST` hint a user would write. Join
  * planning then applies its normal legality rules (a hinted side
  * that cannot build under the join type is ignored), so the hint can
  * never produce an invalid plan; filters above the scan only shrink
  * the side further. User-written hints are never overridden
  * (`JoinHint.NONE` guard — which also makes the rule a fixed point).
  *
  * Installed twice, same object: `injectPreCBORule` for
  * extension-built sessions, `experimental.extraOptimizations`
  * (applied by [[graft.SessionConfs]]) for live ones — both batches
  * run AFTER pushdown wraps the scan. */
object GraftAutoBroadcast extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    plan.transform {
      case j @ Join(left, right, _, _, hint) if hint == JoinHint.NONE =>
        def hintFor(side: LogicalPlan): Option[HintInfo] =
          if (smallGraftScan(side, threshold)) Some(HintInfo(Some(BROADCAST)))
          else None
        val (lh, rh) = (hintFor(left), hintFor(right))
        if (lh.isEmpty && rh.isEmpty) j else j.copy(hint = JoinHint(lh, rh))
    }
  }

  private def smallGraftScan(p: LogicalPlan, threshold: Long): Boolean = p match {
    case PhysicalOperation(_, _, rel: DataSourceV2ScanRelation) =>
      rel.scan match {
        case w: V1ScanWrapper => w.v1Scan match {
          case g: GraftV1Scan =>
            val s = g.estimateStatistics().sizeInBytes()
            s.isPresent && s.getAsLong <= threshold
          case _ => false
        }
        case g: GraftV1Scan =>
          val s = g.estimateStatistics().sizeInBytes()
          s.isPresent && s.getAsLong <= threshold
        case _ => false
      }
    case _ => false
  }
}
