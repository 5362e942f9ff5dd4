package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only `count(*)`: rewrites a whole-table count over a
  * [[ZoneMapFileIndex]]-backed scan into a [[LocalRelation]] holding the
  * snapshot's recorded row count — the optimizer-level face of
  * [[TableStore.rowCount]], so the plain declarative
  * `store.read(t).count()` never plans a scan (same answer Iceberg
  * serves from its manifests). At 100 TB that is the difference between
  * a metadata lookup and a full-table count job.
  *
  * Strictly conservative preconditions — the rewrite fires only when:
  *  - the aggregate has NO grouping columns, and every aggregate
  *    expression is a plain `count(<non-null foldable>)` (`count(*)`
  *    and `count(1)` both resolve to that shape) — no DISTINCT, no
  *    FILTER clause;
  *  - the child is the bare relation under row-count-preserving nodes
  *    only (Project / SubqueryAlias). Any Filter, join, limit, sample,
  *    or generator keeps the scan (their result cardinality differs);
  *  - the relation's index recorded an exact [[ZoneMapFileIndex.totalRows]]
  *    (every file of the snapshot has a commit-time row count; tables
  *    with any stat gap simply never match — fail open to a real scan).
  *
  * Registered per-session on first [[TableStore]] read (idempotent,
  * like the as-of join strategy): `experimental.extraOptimizations`
  * runs it after the main optimizer batches, when the plan has settled
  * into Aggregate → Project → LogicalRelation shape.
  */
object MetadataAggregateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg @ Aggregate(grouping, aggExprs, child, _)
        if grouping.isEmpty && aggExprs.nonEmpty &&
          aggExprs.forall(isPlainCount) =>
      rowsOf(child) match {
        case Some(n) =>
          LocalRelation(agg.output.map(_.asInstanceOf[Attribute]),
            Seq(InternalRow.fromSeq(aggExprs.map(_ => n))))
        case None => agg
      }
  }

  /** `count(e)` counting every row: non-distinct, unfiltered, and every
    * child foldable to a non-null constant (`count(*)`/`count(1)`). */
  private def isPlainCount(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(c: Count, Complete, false, None, _), _) =>
      c.children.nonEmpty && c.children.forall(ch =>
        ch.foldable && ch.eval(InternalRow.empty) != null)
    case _ => false
  }

  /** Exact row count of `plan`, when it is a bare ZoneMapFileIndex scan
    * under cardinality-preserving nodes only. */
  private def rowsOf(plan: LogicalPlan): Option[Long] = plan match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case z: ZoneMapFileIndex => z.totalRows
        case _ => None
      }
      case _ => None
    }
    case Project(projectList, child)
        if projectList.forall(_.deterministic) => rowsOf(child)
    case SubqueryAlias(_, child) => rowsOf(child)
    case _ => None
  }

  /** Idempotent per-session registration (the Bridge checks membership —
    * no session registry held here, so short-lived sessions stay
    * collectable). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.Bridge.addOptimization(spark, this)
}
