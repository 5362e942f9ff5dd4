package graft.tables

import scala.annotation.tailrec

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, Expression, Literal, NamedExpression, UnscaledValue}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions.{coalesce, col, lit}
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, IntegerType, LongType, ShortType}

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
  *    sums, min of mins — still over view-sized data);
  *  - every output expression is a DETERMINISTIC scalar over mapped
  *    aggregates and grouping columns: each `count(<non-null
  *    literal>)` / `count(c)` / `sum(c)` / `avg(c)` / `min(c)` /
  *    `max(c)` inside it maps to stored view state (no DISTINCT, no
  *    FILTER clauses), and the surrounding scalar structure — casts,
  *    arithmetic, ratios like `sum(a)/count(b)` — is re-applied
  *    verbatim over the substituted columns, which is value-exact
  *    because the inputs are;
  *  - aggregate result types are EXACT-ONLY where incremental folding
  *    must be bit-stable: `sum` maps for integral (modular arithmetic
  *    — associative even under wrap) and decimal (exact) inputs;
  *    float/double sums never map — the view's incrementally-folded
  *    partial sums are not bit-equal to a scan's fold, so serving them
  *    would let freshness change results. `avg` maps for DECIMAL
  *    inputs only (Spark's Average accumulates non-decimal input in
  *    DOUBLE, which the stored exact sum can diverge from in ulps or
  *    overflow); the decimal re-derivation `(sum_c / cnt_c) cast
  *    avg-type` is Spark's own Average lowering, rounding included.
  *    `min`/`max`/`count` map for any type. Small-precision decimals
  *    get pre-lowered by Spark's DecimalAggregates before this batch
  *    runs: the lowered SUM (p ≤ 8, `MakeDecimal(sum(UnscaledValue))`
  *    — an exact modular long fold) maps via the stored sum's
  *    unscaled value, while the lowered AVG (p ≤ 11, double-
  *    accumulated) keeps the scan under the same policy;
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
  * `spark.graft.mv.rewrite.enabled=false` (read from the ACTIVE
  * session, so the querying session's setting governs). */
object MvRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg @ Aggregate(_, aggExprs, child, _) if aggExprs.nonEmpty =>
      rewrite(agg, child).getOrElse(agg)
  }

  /** What one mapped aggregate reads from the view. */
  private sealed trait Out
  private case class ViewCol(name: String) extends Out
  private case class AvgOf(c: String, resultType: DataType) extends Out
  /** DecimalAggregates-lowered small-precision sum
    * (`MakeDecimal(sum(UnscaledValue(d)))`): the inner long sum is
    * EXACT (modular), and the stored decimal sum's unscaled value
    * reproduces it — `sum_c × 10^scale` is integral-valued and fits a
    * long by the same p+10 ≤ 18 bound the lowering requires. The
    * MakeDecimal wrapper is ordinary scalar structure and re-applies
    * via the generic substitution. */
  private case class UnscaledSumOf(c: String, scale: Int) extends Out

  private def rewrite(agg: Aggregate, child: LogicalPlan)
      : Option[LogicalPlan] = {
    val (store, tbl, pinnedV) = scanOf(child) match {
      case Some(t) => t
      case None => return None
    }
    val session =
      SparkSession.getActiveSession.getOrElse(store.sparkSession)
    if (!session.conf
        .get("spark.graft.mv.rewrite.enabled", "true").toBoolean) return None
    // group keys: bare columns of the scanned table, resolved by name
    val groupResolved: Seq[(Attribute, String)] =
      agg.groupingExpressions.map {
        case a: Attribute =>
          columnNameOf(child, a, store, tbl) match {
            case Some(n) => (a, n)
            case None => return None
          }
        case _ => return None
      }
    val groupNameOf: Map[ExprId, String] =
      groupResolved.map { case (a, n) => a.exprId -> n }.toMap
    val groupNames = groupResolved.map(_._2)
    // cheap structural pre-pass: every output must LOOK mappable
    // (deterministic scalar over well-shaped aggregates and grouping
    // attrs) before any metadata is read
    if (!agg.aggregateExpressions.forall(e =>
      shapeOk(e, groupNameOf.keySet))) return None
    if (store.mvMarkersOf(tbl).isEmpty) return None // ONE listing, common case
    val atVersion = pinnedV.getOrElse(
      scala.util.Try(store.currentVersion(tbl)).getOrElse(return None))
    val mv = MaterializedView.freshViewFor(store, tbl, atVersion) match {
      case Some(d) => d
      case None => return None
    }
    // exact-grouping match reads the view as-is; a SUBSET of its keys
    // (incl. empty — global aggregates) re-aggregates it (rollup)
    val qKeys = groupNames.distinct.toSet
    val isExact = qKeys == mv.groupCols.toSet
    if (!isExact && !qKeys.subsetOf(mv.groupCols.toSet)) return None
    // group columns must exist in the view with the exact source type
    if (!groupResolved.forall { case (a, n) =>
      mv.schema.fields.find(_.name == n).exists(_.dataType == a.dataType) })
      return None
    // collect DISTINCT aggregates across all outputs; map each to
    // stored state, type-exact
    val distinctAggs = scala.collection.mutable.ArrayBuffer
      .empty[(AggregateExpression, Out)]
    def slotOf(ae: AggregateExpression): Option[Int] = {
      val i = distinctAggs.indexWhere(_._1.semanticEquals(ae))
      if (i >= 0) Some(i)
      else aggOut(ae, mv).map { o => distinctAggs += ((ae, o));
        distinctAggs.size - 1 }
    }
    agg.aggregateExpressions.foreach {
      case _: Attribute => ()
      case Alias(c, _) =>
        c.foreach {
          case ae: AggregateExpression =>
            if (slotOf(ae).isEmpty) return None
          case _ => ()
        }
      case _ => return None
    }
    // assemble the replacement in DataFrame-land (analyzed, then
    // grafted under the original output ids). Exact: the view as-is
    // plus derived slot columns; rollup: groupBy(subset keys) with
    // re-aggregated slots.
    def sumType(n: String): DataType =
      mv.schema(mv.schema.fieldIndex(n)).dataType
    def unscaled(c: String, scale: Int): Column =
      (col(s"`sum_$c`") * lit(java.math.BigDecimal.TEN.pow(scale)))
        .cast(org.apache.spark.sql.types.LongType)
    def slotExact(o: Out): Column = o match {
      case ViewCol(n) => col(s"`$n`")
      case AvgOf(c, rt) =>
        // EXACTLY Spark's Average lowering for decimal: Divide(sum,
        // cnt) under the session's arithmetic rules, cast to Average's
        // result type — precision and rounding included
        (col(s"`sum_$c`") / col(s"`cnt_$c`")).cast(rt)
      case UnscaledSumOf(c, scale) => unscaled(c, scale)
    }
    def slotRoll(o: Out): Column = o match {
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
      case UnscaledSumOf(c, scale) =>
        // sum of per-group unscaled longs — modular, identical to the
        // lowered single-level fold
        org.apache.spark.sql.functions.sum(unscaled(c, scale))
          .cast(org.apache.spark.sql.types.LongType)
      case ViewCol(n) => col(s"`$n`") // unreachable for stored columns
    }
    val projected = scala.util.Try {
      val mvDf = store.read(mv.mv)
      val keyCols = groupNames.distinct.map(n => col(s"`$n`"))
      if (isExact) {
        val cols = keyCols ++ distinctAggs.zipWithIndex.map {
          case ((_, o), k) => slotExact(o).as(s"_mv_a_$k") }
        mvDf.select(cols: _*).queryExecution.analyzed
      } else {
        val slots = distinctAggs.zipWithIndex.map {
          case ((_, o), k) => slotRoll(o).as(s"_mv_a_$k") }
        val aggCols =
          // keys-only query (SELECT g … GROUP BY g): an explicit
          // Aggregate, NOT .distinct() — the grafted plan skips the
          // main optimizer batches, and a raw Deduplicate node would
          // reach physical planning unlowered
          if (slots.isEmpty)
            Seq(org.apache.spark.sql.functions.max(lit(1)).as("_mv_one"))
          else slots.toSeq
        mvDf.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
          .queryExecution.analyzed
      }
    }.toOption match {
      case Some(p) => p
      case None => return None
    }
    val keyAttr: Map[String, Attribute] =
      projected.output.filter(a => qKeys.contains(a.name))
        .map(a => a.name -> a).toMap
    val slotAttr: Map[Int, Attribute] = distinctAggs.indices.flatMap(k =>
      projected.output.find(_.name == s"_mv_a_$k").map(k -> _)).toMap
    if (keyAttr.size != qKeys.size || slotAttr.size != distinctAggs.size)
      return None
    // graft: every output's scalar structure re-applies verbatim over
    // the substituted view columns, under the ORIGINAL output ids
    def substituted(c: Expression): Expression = c.transform {
      case ae: AggregateExpression =>
        slotAttr(distinctAggs.indexWhere(_._1.semanticEquals(ae)))
      case a: Attribute if groupNameOf.contains(a.exprId) =>
        keyAttr(groupNameOf(a.exprId))
    }
    val projList: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: Attribute =>
        Alias(keyAttr(groupNameOf(a.exprId)), a.name)(
          exprId = a.exprId, qualifier = a.qualifier)
      case al @ Alias(c, n) =>
        val sub = substituted(c)
        // belt-and-suspenders: nothing unsubstituted may remain
        if (sub.exists(_.isInstanceOf[AggregateExpression]) ||
          !sub.references.subsetOf(
            org.apache.spark.sql.catalyst.expressions.AttributeSet(
              projected.output)))
          return None
        Alias(sub, n)(exprId = al.exprId, qualifier = al.qualifier)
      case _ => return None
    }
    val out = Project(projList, projected)
    if (out.output.map(_.dataType) != agg.output.map(_.dataType))
      return None
    logInfo(s"rewrote GROUP BY over $tbl@v$atVersion onto materialized " +
      s"view ${mv.mv}" + (if (isExact) "" else " (rollup)"))
    Some(out)
  }

  /** Structural screen for one output expression — no metadata needed:
    * a grouping attribute, or a deterministic scalar whose aggregate
    * leaves are well-shaped (Complete, non-distinct, unfiltered,
    * supported function) and whose non-aggregate references are all
    * grouping attributes. */
  private def shapeOk(e: NamedExpression, groupIds: Set[ExprId]): Boolean =
    e match {
      case a: Attribute => groupIds.contains(a.exprId)
      case Alias(c, _) if c.deterministic =>
        val aggsOk = c.collect { case ae: AggregateExpression => ae }
          .forall {
            case AggregateExpression(fn, Complete, false, None, _) =>
              fn match {
                case cnt: Count => cnt.children.nonEmpty
                case _: Sum | _: Min | _: Max | _: Average => true
                case _ => false
              }
            case _ => false
          }
        // references OUTSIDE aggregate subtrees must be grouping attrs
        val stripped = c.transform {
          case ae: AggregateExpression => Literal(null, ae.dataType)
        }
        aggsOk && stripped.references.forall(a => groupIds.contains(a.exprId))
      case _ => false
    }

  /** Map one aggregate to view state; None = not rewritable. Exactness
    * policy lives here (see the class doc): sums only for integral /
    * decimal inputs, avg only for decimal. */
  private def aggOut(ae: AggregateExpression,
      mv: MaterializedView.MvDef): Option[Out] = {
    def viewCol(name: String, want: DataType): Option[Out] =
      mv.schema.fields.find(_.name == name)
        .filter(_.dataType == want).map(_ => ViewCol(name))
    def exactSummable(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false // float/double folds are not bit-stable
    }
    ae match {
      case AggregateExpression(fn, Complete, false, None, _) => fn match {
        case c: Count
            if c.children.forall(ch => ch.foldable &&
              ch.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
                != null) =>
          viewCol("cnt", ae.dataType)
        case Count(Seq(a: AttributeReference)) =>
          Some(a.name).filter(mv.sumCols)
            .flatMap(cn => viewCol(s"cnt_$cn", ae.dataType))
        case Sum(a: AttributeReference, _) if exactSummable(a.dataType) =>
          Some(a.name).filter(mv.sumCols)
            .flatMap(cn => viewCol(s"sum_$cn", ae.dataType))
        case Sum(UnscaledValue(a: AttributeReference), _)
            if ae.dataType == LongType &&
              a.dataType.isInstanceOf[DecimalType] =>
          // DecimalAggregates-lowered small-precision decimal sum
          Some(a.name).filter(mv.sumCols).flatMap { cn =>
            mv.schema.fields.find(_.name == s"sum_$cn")
              .filter(_.dataType.isInstanceOf[DecimalType])
              .map(_ => UnscaledSumOf(cn,
                a.dataType.asInstanceOf[DecimalType].scale))
          }
        case Min(a: AttributeReference) =>
          Some(a.name).filter(mv.minCols)
            .flatMap(cn => viewCol(s"min_$cn", ae.dataType))
        case Max(a: AttributeReference) =>
          Some(a.name).filter(mv.maxCols)
            .flatMap(cn => viewCol(s"max_$cn", ae.dataType))
        case Average(a: AttributeReference, _)
            if a.dataType.isInstanceOf[DecimalType] =>
          Some(a.name).filter(mv.sumCols)
            .filter(cn => mv.schema.fieldNames.contains(s"sum_$cn") &&
              mv.schema.fieldNames.contains(s"cnt_$cn"))
            .map(cn => AvgOf(cn, ae.dataType))
        case _ => None
      }
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
