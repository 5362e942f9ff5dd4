package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only aggregates at OPTIMIZATION time: rewrites a whole-table
  * `count(*)` / `min(zoneCol)` / `max(zoneCol)` over a
  * [[ZoneMapFileIndex]]-backed scan into a [[LocalRelation]] holding the
  * snapshot's recorded statistics — the optimizer-level face of
  * [[TableStore.rowCount]]/[[TableStore.columnRange]], so the plain
  * declarative `store.read(t).count()` or `.agg(min($"k"))` never plans
  * a scan (the answer Iceberg serves from its manifests). At 100 TB
  * that is a metadata lookup versus a full-table job.
  *
  * Strictly conservative preconditions — the rewrite fires only when:
  *  - the aggregate has NO grouping columns and EVERY aggregate
  *    expression is rewritable: a plain `count(<non-null foldable>)`
  *    (`count(*)`/`count(1)` resolve to that shape — no DISTINCT, no
  *    FILTER clause), or `min`/`max` of a bare column whose attribute
  *    resolves through the projection chain to a relation column with a
  *    recorded global bound ([[ZoneMapFileIndex.columnBounds]] — absent
  *    whenever ANY file lacks a stat, e.g. all-null or legacy files, so
  *    null-ignoring SQL semantics are preserved exactly);
  *  - the child is the bare relation under row-preserving nodes only
  *    (deterministic Project / SubqueryAlias). Any Filter, join, limit,
  *    or sample keeps the scan;
  *  - the bound's stat-domain value converts EXACTLY to the column type
  *    (integral stats are stored as Long, float bounds as their exact
  *    widened double; Decimal columns never qualify — their stats were
  *    printed through a lossy double path and pruning-only).
  *
  * Registered per-session on first [[TableStore]] read (idempotent,
  * like the as-of join strategy): `experimental.extraOptimizations`
  * runs after the main optimizer batches, when the plan has settled
  * into Aggregate → Project → LogicalRelation shape.
  */
object MetadataAggregateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg @ Aggregate(grouping, aggExprs, child, _)
        if grouping.isEmpty && aggExprs.nonEmpty =>
      indexOf(child) match {
        case Some(idx) =>
          val vals = aggExprs.map(e => valueFor(e, idx, child))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get))))
          else agg
        case None => agg
      }
  }

  /** The recorded value for one aggregate expression, or None when it is
    * not rewritable from metadata. */
  private def valueFor(e: NamedExpression, idx: ZoneMapFileIndex,
      child: LogicalPlan): Option[Any] = e match {
    case Alias(AggregateExpression(c: Count, Complete, false, None, _), _)
        if c.children.nonEmpty && c.children.forall(ch =>
          ch.foldable && ch.eval(InternalRow.empty) != null) =>
      idx.totalRows
    case Alias(AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _) =>
      boundOf(idx, child, a, wantMin = true)
    case Alias(AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _) =>
      boundOf(idx, child, a, wantMin = false)
    case _ => None
  }

  private def boundOf(idx: ZoneMapFileIndex, child: LogicalPlan,
      a: AttributeReference, wantMin: Boolean): Option[Any] =
    physicalNameOf(child, a).flatMap(idx.columnBounds.get).flatMap { b =>
      internalValue(if (wantMin) b._1 else b._2, a.dataType)
    }

  /** Follow `attr` down through renames/projections to the relation's
    * (physical) column name; None if anything other than a bare column
    * reference appears on the way. */
  @scala.annotation.tailrec
  private def physicalNameOf(plan: LogicalPlan, attr: Attribute): Option[String] =
    plan match {
      case l: LogicalRelation =>
        if (l.output.exists(_.exprId == attr.exprId)) Some(attr.name) else None
      case Project(list, child) =>
        list.find(_.exprId == attr.exprId) match {
          case Some(a: AttributeReference) => physicalNameOf(child, a)
          case Some(Alias(a: AttributeReference, _)) => physicalNameOf(child, a)
          case _ => None
        }
      case SubqueryAlias(_, child) => physicalNameOf(child, attr)
      case _ => None
    }

  /** Stat-domain value → EXACT Catalyst internal value of `dt`; None when
    * the pair doesn't convert exactly (then the scan stays). Shared with
    * the DSv2 aggregate pushdown ([[GraftScanBuilder]]) so both metadata
    * answer paths apply identical exactness rules. */
  private[tables] def internalValue(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (l: Long, LongType)    => Some(l)
    case (l: Long, IntegerType) => Some(l.toInt)
    case (l: Long, ShortType)   => Some(l.toShort)
    case (l: Long, ByteType)    => Some(l.toByte)
    case (d: Double, DoubleType) => Some(d)
    case (d: Double, FloatType)  => Some(d.toFloat) // stats store the exact widened double
    case (s: String, StringType) => Some(UTF8String.fromString(s))
    case _ => None
  }

  /** The ZoneMapFileIndex under `plan`, when `plan` is a bare scan below
    * cardinality-preserving nodes only. */
  private def indexOf(plan: LogicalPlan): Option[ZoneMapFileIndex] = plan match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case z: ZoneMapFileIndex => Some(z)
        case _ => None
      }
      case _ => None
    }
    case Project(projectList, child)
        if projectList.forall(_.deterministic) => indexOf(child)
    case SubqueryAlias(_, child) => indexOf(child)
    case _ => None
  }

  /** Idempotent per-session registration (the Bridge checks membership —
    * no session registry held here, so short-lived sessions stay
    * collectable). */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.Bridge.addOptimization(spark, this)
}
