package graft.tables

import scala.annotation.tailrec

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.{DataType, NumericType}

/** TRANSPARENT materialized-view consumption: an optimizer rule that
  * rewrites a plain aggregate plan — the SQL text the user would write
  * anyway, `SELECT g…, count(*)/sum(c)/avg(c)/min(c)/max(c) FROM t
  * GROUP BY g…` — onto a registered materialized view of `t` whose
  * contents are PROVABLY equivalent, so the query reads the (tiny) view
  * instead of scanning the source. At 100 TB this rewrite is the entire
  * point of maintaining the view: the incremental refresh keeps it
  * cheap to maintain ([[MaterializedView.refresh]]), and this rule
  * makes it free to USE — no query rewrite by the user, no stale
  * dashboards pinned to a view name.
  *
  * Equivalence, not heuristics — the rewrite fires only when ALL of:
  *
  *  - the aggregate's grouping columns are bare columns of the scanned
  *    table whose set either matches the view's `GROUP BY` set exactly
  *    (order-free — the view reads as-is) or is a SUBSET of it,
  *    including the empty set for a global aggregate (the ROLLUP
  *    property: the view re-aggregates — count(*) = sum(cnt), sum of
  *    sums, min of mins — still over view-sized data; float/double
  *    sums are excluded there, their re-fold is not bit-stable);
  *  - every output expression maps to stored view state: a grouping
  *    column; `count(<non-null literal>)` → `cnt`; `count(c)` /
  *    `sum(c)` / `avg(c)` → the `sum:c|avg:c` pair (`avg` re-derives as
  *    `sum/cnt` with the exact Divide+cast shape Spark's own Average
  *    lowers to, so values — including decimal rounding — are
  *    identical); `min(c)` / `max(c)` → `min:c`/`max:c`. No DISTINCT,
  *    no FILTER clauses, and every result type must match the view
  *    column exactly;
  *  - the scan is the bare table under row-preserving nodes only
  *    (deterministic Project / SubqueryAlias — any Filter, join, limit
  *    or sample keeps the scan), identified through either read path:
  *    the V1 relation's [[ZoneMapFileIndex.owner]] tag or the DSv2
  *    relation's [[GraftSqlTable]];
  *  - the view is FRESH at exactly the version the scan is planned
  *    against ([[MaterializedView.freshViewFor]]: the `mv.applied-
  *    version` commit tag equals the scan's pinned version — the
  *    snapshot the V1 index listed, the explicit `VERSION AS OF`, or
  *    the source's current version for a DSv2 scan), bound to the
  *    current source incarnation, and unfiltered. A STALE view (any
  *    source commit since the last refresh) simply does not match and
  *    the plan keeps the scan — staleness can never change results,
  *    only whether the shortcut applies.
  *
  * Cost of the attempt: structural matching is pure plan analysis; the
  * metadata reads (marker listing, view properties, applied-version
  * tag) run only after the plan shape fully matches, and the marker
  * listing is the first touch — a table with no registered view pays
  * ONE directory listing. Registered per-session like
  * [[MetadataAggregateRule]]; disable with
  * `spark.graft.mv.rewrite.enabled=false`. */
object MvRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg @ Aggregate(_, aggExprs, child, _) if aggExprs.nonEmpty =>
      rewrite(agg, child).getOrElse(agg)
  }

  /** What one aggregate-output expression reads from the view. */
  private sealed trait Out
  /** A grouping key (pass-through column of the view). */
  private case class GroupCol(name: String) extends Out
  private case class ViewCol(name: String) extends Out
  private case class AvgOf(c: String, resultType: DataType) extends Out
  /** A deterministic CAST wrapped around a mapped aggregate — the shape
    * CollapseProject leaves behind for `CAST(sum(x) AS DOUBLE)`-style
    * outputs; the same cast applies to the view column, value-exact
    * because the inputs are. */
  private case class CastOf(inner: Out, to: DataType) extends Out

  private def rewrite(agg: Aggregate, child: LogicalPlan)
      : Option[LogicalPlan] = {
    val (store, tbl, pinned) = scanOf(child) match {
      case Some(t) => t
      case None => return None
    }
    if (!store.sparkSession.conf
        .get("spark.graft.mv.rewrite.enabled", "true").toBoolean) return None
    // group keys: bare columns of the scanned table, resolved by name
    val groupNames: Seq[String] = agg.groupingExpressions.map {
      case a: Attribute => columnNameOf(child, a, store, tbl)
      case _ => None
    } match {
      case names if names.forall(_.isDefined) => names.map(_.get)
      case _ => return None
    }
    // cheap structural pre-pass: every output must LOOK mappable before
    // any metadata is read
    val groupAttrIds = agg.groupingExpressions.collect {
      case a: Attribute => a.exprId }.toSet
    if (!agg.aggregateExpressions.forall(e => shapeOk(e, groupAttrIds)))
      return None
    if (store.mvMarkersOf(tbl).isEmpty) return None // ONE listing, common case
    val atVersion = pinned.getOrElse(
      scala.util.Try(store.currentVersion(tbl)).getOrElse(return None))
    val mv = MaterializedView.freshViewFor(store, tbl, atVersion) match {
      case Some(d) => d
      case None => return None
    }
    // exact-grouping match reads the view as-is; a STRICT SUBSET of the
    // view's keys (including the empty set — a global aggregate)
    // re-aggregates the view: count(*) = sum(cnt), sum = sum of sums,
    // min/max of mins/maxes, avg from the re-summed pair — the classic
    // rollup property of distributive/algebraic aggregates. Anything
    // not a subset keeps the scan.
    val qKeys = groupNames.distinct.toSet
    val isExact = qKeys == mv.groupCols.toSet &&
      mv.groupCols.size == groupNames.distinct.size
    if (!isExact && !qKeys.subsetOf(mv.groupCols.toSet)) return None
    // map every output expression to stored view state, type-exact
    val outs: Seq[Out] = agg.aggregateExpressions.map(e =>
      outOf(e, groupAttrIds, child, store, tbl, mv) match {
        case Some(o) => o
        case None => return None
      })
    // re-aggregating FLOAT/DOUBLE sums is accumulation-order-dependent
    // (sum of partial sums ≠ the scan's fold, bit-wise) — those rollups
    // keep the scan; integral and decimal sums re-fold exactly
    def sumColOf(o: Out): Option[String] = o match {
      case ViewCol(n) if n.startsWith("sum_") => Some(n)
      case AvgOf(c, _) => Some(s"sum_$c")
      case CastOf(inner, _) => sumColOf(inner)
      case _ => None
    }
    if (!isExact && outs.exists(o => sumColOf(o).exists(n =>
      mv.schema.fields.find(_.name == n).exists(f =>
        f.dataType == org.apache.spark.sql.types.DoubleType ||
          f.dataType == org.apache.spark.sql.types.FloatType))))
      return None
    // assemble the replacement: the view read plus derived columns,
    // analyzed in DataFrame-land, grafted under the original output ids
    def toCol(o: Out): Column = o match {
      case GroupCol(n) => col(s"`$n`")
      case ViewCol(n) => col(s"`$n`")
      case AvgOf(c, rt) =>
        // EXACTLY Spark's Average lowering: Divide(sum, cnt) under the
        // session's arithmetic rules, cast to Average's result type —
        // decimal precision/rounding included
        (col(s"`sum_$c`") / col(s"`cnt_$c`")).cast(rt)
      case CastOf(inner, to) => toCol(inner).cast(to)
    }
    // rollup shape: each stored column re-aggregates; the cast back to
    // the stored sum type keeps the avg division and the output types
    // identical to the single-level plan's
    def sumType(n: String): DataType =
      mv.schema(mv.schema.fieldIndex(n)).dataType
    def toRoll(o: Out): Column = o match {
      case GroupCol(n) => col(s"`$n`") // resolved against the grouped frame
      case ViewCol(n) if n == "cnt" || n.startsWith("cnt_") =>
        coalesce(org.apache.spark.sql.functions.sum(col(s"`$n`")), lit(0L))
      case ViewCol(n) if n.startsWith("sum_") =>
        org.apache.spark.sql.functions.sum(col(s"`$n`")).cast(sumType(n))
      case ViewCol(n) if n.startsWith("min_") =>
        org.apache.spark.sql.functions.min(col(s"`$n`"))
      case ViewCol(n) if n.startsWith("max_") =>
        org.apache.spark.sql.functions.max(col(s"`$n`"))
      case AvgOf(c, rt) =>
        (org.apache.spark.sql.functions.sum(col(s"`sum_$c`"))
          .cast(sumType(s"sum_$c")) /
          coalesce(org.apache.spark.sql.functions.sum(col(s"`cnt_$c`")),
            lit(0L))).cast(rt)
      case CastOf(inner, to) => toRoll(inner).cast(to)
      case ViewCol(n) => col(s"`$n`") // group key addressed as ViewCol
    }
    val projected = scala.util.Try {
      val mvDf = store.read(mv.mv)
      if (isExact)
        mvDf.select(outs.zipWithIndex.map {
          case (o, i) => toCol(o).as(s"_mv_$i") }: _*)
          .queryExecution.analyzed
      else {
        val keys = groupNames.distinct.map(n => col(s"`$n`"))
        val (aggOuts, keyOuts) = outs.zipWithIndex.partition {
          case (GroupCol(_), _) => false
          case _ => true
        }
        val base =
          if (aggOuts.isEmpty)
            // SELECT keys only: GROUP BY over the view's keys. An
            // explicit Aggregate, NOT .distinct() — the grafted plan
            // skips the main optimizer batches, and a raw Deduplicate
            // node would reach physical planning unlowered.
            mvDf.groupBy(keys: _*)
              .agg(org.apache.spark.sql.functions.max(lit(1)).as("_mv_one"))
          else {
            val aggCols = aggOuts.map { case (o, i) =>
              toRoll(o).as(s"_mv_$i") }
            mvDf.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
          }
        val _ = keyOuts // keys are addressed by name below
        base.select(outs.zipWithIndex.map {
          case (GroupCol(n), i) => col(s"`$n`").as(s"_mv_$i")
          case (_, i) => col(s"`_mv_$i`")
        }: _*).queryExecution.analyzed
      }
    }.toOption match {
      case Some(p) => p
      case None => return None
    }
    if (projected.output.map(_.dataType) != agg.output.map(_.dataType))
      return None
    logInfo(s"rewrote GROUP BY over $tbl@v$atVersion onto materialized " +
      s"view ${mv.mv}")
    Some(Project(agg.output.zip(projected.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, projected))
  }

  /** Structural screen for one output expression — no metadata needed.
    * A deterministic Cast directly over the aggregate also qualifies
    * (CollapseProject folds `CAST(sum(x) AS DOUBLE)` selects into the
    * Aggregate's own output list). */
  private def shapeOk(e: NamedExpression,
      groupIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId])
      : Boolean = {
    def aggShape(fn: Expression): Boolean = fn match {
      case c: Count => c.children.nonEmpty
      case _: Sum | _: Min | _: Max | _: Average => true
      case _ => false
    }
    e match {
      case a: Attribute => groupIds.contains(a.exprId)
      case Alias(a: Attribute, _) => groupIds.contains(a.exprId)
      case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
        aggShape(fn)
      case Alias(Cast(AggregateExpression(fn, Complete, false, None, _),
          _, _, _), _) => aggShape(fn)
      case _ => false
    }
  }

  /** Map one output expression to view state; None = not rewritable. */
  private def outOf(e: NamedExpression,
      groupIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId],
      child: LogicalPlan, store: TableStore, tbl: String,
      mv: MaterializedView.MvDef): Option[Out] = {
    def viewCol(name: String, want: DataType): Option[Out] =
      mv.schema.fields.find(_.name == name)
        .filter(_.dataType == want).map(_ => ViewCol(name))
    def groupCol(name: String, want: DataType): Option[Out] =
      mv.schema.fields.find(_.name == name)
        .filter(_.dataType == want).map(_ => GroupCol(name))
    def srcCol(a: Attribute): Option[String] =
      columnNameOf(child, a, store, tbl)
    def aggOut(fn: Expression, want: DataType): Option[Out] = fn match {
      case c: Count
          if c.children.forall(ch => ch.foldable &&
            ch.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
              != null) =>
        viewCol("cnt", want)
      case Count(Seq(a: AttributeReference)) =>
        srcCol(a).filter(mv.sumCols)
          .flatMap(cn => viewCol(s"cnt_$cn", want))
      case Sum(a: AttributeReference, _) =>
        srcCol(a).filter(mv.sumCols)
          .flatMap(cn => viewCol(s"sum_$cn", want))
      case Min(a: AttributeReference) =>
        srcCol(a).filter(mv.minCols)
          .flatMap(cn => viewCol(s"min_$cn", want))
      case Max(a: AttributeReference) =>
        srcCol(a).filter(mv.maxCols)
          .flatMap(cn => viewCol(s"max_$cn", want))
      case Average(a: AttributeReference, _)
          if a.dataType.isInstanceOf[NumericType] =>
        srcCol(a).filter(mv.sumCols)
          .filter(cn => mv.schema.fieldNames.contains(s"sum_$cn") &&
            mv.schema.fieldNames.contains(s"cnt_$cn"))
          .map(cn => AvgOf(cn, want))
      case _ => None
    }
    e match {
      case a: Attribute if groupIds.contains(a.exprId) =>
        srcCol(a).flatMap(groupCol(_, a.dataType))
      case Alias(a: Attribute, _) if groupIds.contains(a.exprId) =>
        srcCol(a).flatMap(groupCol(_, a.dataType))
      case Alias(ae @ AggregateExpression(fn, Complete, false, None, _), _) =>
        aggOut(fn, ae.dataType)
      case Alias(Cast(ae @ AggregateExpression(fn, Complete, false, None, _),
          dt, _, _), _) =>
        aggOut(fn, ae.dataType).map(CastOf(_, dt))
      case _ => None
    }
  }

  /** The scanned managed table under row-preserving nodes only:
    * (store, table, pinned version — None = DSv2 current). */
  @tailrec
  private def scanOf(plan: LogicalPlan)
      : Option[(TableStore, String, Option[Int])] = plan match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case z: ZoneMapFileIndex =>
          z.owner.map { case (st, t, v) => (st, t, Some(v)) }
        case _ => None
      }
      case _ => None
    }
    case s: DataSourceV2ScanRelation => s.relation.table match {
      case t: GraftSqlTable => Some(t.mvSource)
      case _ => None
    }
    case Project(list, ch) if list.forall(_.deterministic) => scanOf(ch)
    case SubqueryAlias(_, ch) => scanOf(ch)
    case _ => None
  }

  /** LOGICAL source-column name behind `attr`, following renames and
    * projections down to the scan; None when anything other than a bare
    * column reference appears on the way. The V1 relation's output uses
    * PHYSICAL names (renames happen in the projection above), so the
    * resolved name maps back through the store's rename ledger. */
  @tailrec
  private def columnNameOf(plan: LogicalPlan, attr: Attribute,
      store: TableStore, tbl: String): Option[String] = plan match {
    case l: LogicalRelation =>
      if (l.output.exists(_.exprId == attr.exprId))
        store.logicalNameOfPhys(tbl, attr.name)
      else None
    case s: DataSourceV2ScanRelation =>
      // DSv2 output carries logical names directly
      if (s.output.exists(_.exprId == attr.exprId)) Some(attr.name) else None
    case Project(list, ch) =>
      list.find(_.exprId == attr.exprId) match {
        case Some(a: AttributeReference) => columnNameOf(ch, a, store, tbl)
        case Some(Alias(a: AttributeReference, _)) =>
          columnNameOf(ch, a, store, tbl)
        case _ => None
      }
    case SubqueryAlias(_, ch) => columnNameOf(ch, attr, store, tbl)
    case _ => None
  }

  /** Idempotent per-session registration, like [[MetadataAggregateRule]]. */
  def register(spark: SparkSession): Unit =
    org.apache.spark.sql.graftshim.Bridge.addOptimization(spark, this)
}
