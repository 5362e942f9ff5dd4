package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}

/** Statistics forwarding for V1-bridged DSv2 scans.
  *
  * `V2ScanRelationPushDown` wraps every [[V1Scan]] in a plain
  * `V1ScanWrapper` that forwards `readSchema` but NOT
  * [[SupportsReportStatistics]] — so `DataSourceV2ScanRelation
  * .computeStats()` (an `instanceof SupportsReportStatistics` check on
  * the scan) falls back to `spark.sql.defaultSizeInBytes` =
  * `Long.MaxValue`, and a V1-bridged table can never win an
  * auto-broadcast decision no matter what its scan reports. This shim
  * restores the stats path: a wrapper SUBCLASS that forwards
  * `estimateStatistics()` to the wrapped scan, swapped in by a tiny
  * optimizer rule running after the push-down batch and before the
  * planner reads `plan.stats` for join selection.
  */
final class StatsV1ScanWrapper(
    v1: V1Scan with SupportsReportStatistics,
    handled: Seq[org.apache.spark.sql.sources.Filter],
    ops: org.apache.spark.sql.execution.datasources.v2.PushedDownOperators)
  extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = v1.estimateStatistics()

  // NOT equal to the plain wrapper it replaces: the inherited case-class
  // equals would make `transformDown`'s fastEquals treat the swap as a
  // no-op and keep the stat-less original. The generated equals calls
  // `that.canEqual(this)`, so rejecting plain wrappers here breaks the
  // equality in BOTH directions.
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => s.canEqual(this) && super.equals(s)
    case _ => false
  }
}

/** Swaps stat-less `V1ScanWrapper`s over stats-reporting scans for
  * [[StatsV1ScanWrapper]]. Runs in the "User Provided Optimizers" batch
  * — after `V2ScanRelationPushDown` created the wrapper, before physical
  * planning consults `computeStats` for broadcast thresholds. The
  * subclass still matches every `V1ScanWrapper(...)` pattern in
  * `DataSourceV2Strategy`, so execution is untouched. */
object ReportV1ScanStatsRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation =>
      r.scan match {
        case w: V1ScanWrapper if !w.isInstanceOf[SupportsReportStatistics] =>
          w.v1Scan match {
            case s: SupportsReportStatistics =>
              r.copy(scan = new StatsV1ScanWrapper(
                s.asInstanceOf[V1Scan with SupportsReportStatistics],
                w.handledFilters, w.pushedDownOperators))
            case _ => r
          }
        case _ => r
      }
  }

  /** Idempotent per-session registration (same runtime path as the
    * metadata-aggregate rule). */
  def register(spark: SparkSession): Unit =
    Bridge.addOptimization(spark, this)
}
