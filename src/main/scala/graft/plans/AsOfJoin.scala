package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampType}

/** AS-OF JOIN as a first-class operator — the SURVEY §2 custom-operator
  * path (c): a whole-operator semantics Spark's built-ins lack (the
  * window-composed formulation in `Events.evAsof` only works when both
  * sides fit ONE union-able schema and the matched value is a single
  * column; this node joins the full right ROW).
  *
  * Semantics: for every left row, the right row with the LARGEST time ≤
  * the left row's time among rows sharing the join keys (optionally
  * within `toleranceMicros`); unmatched left rows keep nulls — i.e.
  * LEFT OUTER AS-OF. If several right rows share that instant, which one
  * is returned is unspecified (include a tiebreak in the time column's
  * derivation if it matters).
  *
  * Scale shape: both sides hash-cluster on the join keys and sort
  * within partitions by (keys, time) — declared via
  * requiredChildDistribution/Ordering, so Catalyst's EnsureRequirements
  * inserts exactly the exchanges/sorts a sort-merge join would get, AQE
  * included. The merge itself is a single forward pass per partition
  * holding ONE buffered right row — O(left + right) time, O(1) memory,
  * no per-key grouping materialization.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Long) extends BinaryNode {

  // key columns surface once, from the left side (USING-join semantics) —
  // the right keys are equal by construction on every matched row
  override def output: Seq[Attribute] =
    left.output ++ AsOfJoinPlan.nonKeyRight(right.output, rightKeys)
      .map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  private[plans] def nonKeyRight(rightOutput: Seq[Attribute],
      rightKeys: Seq[Expression]): Seq[Attribute] =
    rightOutput.filterNot(a => rightKeys.exists(_.semanticEquals(a)))
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. Injected per-session via
  * [[graft.ops.AsOf.asofJoin]] (experimental.extraStrategies) or globally
  * through GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ AsOfJoinPlan.nonKeyRight(right.output, rightKeys)
      .map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  // the SAME contract a shuffled join declares: cluster both sides on the
  // join keys (EnsureRequirements co-partitions them) and sort by
  // (keys, time) so the per-partition merge sees both streams in order
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  // rows never leave their left-side partition, so downstream operators
  // clustered on the same keys (a following groupBy, another as-of) can
  // reuse the exchange instead of reshuffling
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    import AsOfJoinExec.timeToLong
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val tol = toleranceMicros
    val keyTypes = lk.map(_.dataType)
    val ltType = lt.dataType
    val rtType = rt.dataType
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, leftOut)
      val rKeyProj = UnsafeProjection.create(rk, rightOut)
      // a SECOND right-key projection for the buffered match, so probing
      // a new right row never clobbers the buffered row's key bytes
      val mKeyProj = UnsafeProjection.create(rk, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind the (deduplicated) output against the FULL joined row — the
      // right keys exist in the input but are dropped by the projection.
      // The right attrs MUST bind as nullable here even when the child
      // schema says otherwise: unmatched left rows read from the all-null
      // GenericInternalRow, and a nullable=false BoundReference would skip
      // the null check and read the slot as 0 instead of null
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var lastMatch: InternalRow = _ // latest right ≤ current left
        private var lastMatchTime: Long = 0L

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lNullKey = {
            var i = 0; var any = false
            while (i < keyTypes.length && !any) { any = lKey.isNullAt(i); i += 1 }
            any
          }
          val lTimeRow = lTimeProj(l)
          if (lNullKey || lTimeRow.isNullAt(0)) {
            // null key or null time never matches (SQL join-key semantics)
            numOutputRows += 1
            return resultProj(joined(l, nullRight))
          }
          val lTime = timeToLong(ltType, lTimeRow)
          // drop a buffered match that belongs to a previous key
          if (lastMatch != null && keyOrd.compare(mKeyProj(lastMatch), lKey) != 0)
            lastMatch = null
          // advance the right stream: consume every row whose (key, time)
          // is at or before (lKey, lTime); the LAST one consumed for this
          // key is the as-of match
          var advancing = true
          while (advancing && (rHead != null || rIter.hasNext)) {
            if (rHead == null) rHead = rIter.next()
            val rKey = rKeyProj(rHead)
            var rNull = false
            var i = 0
            while (i < keyTypes.length && !rNull) { rNull = rKey.isNullAt(i); i += 1 }
            val rTimeRow = rTimeProj(rHead)
            if (rNull || rTimeRow.isNullAt(0)) {
              rHead = null // null-keyed/timed right rows match nothing
            } else {
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) rHead = null // earlier key: obsolete, discard
              else if (cmp == 0 && timeToLong(rtType, rTimeRow) <= lTime) {
                lastMatchTime = timeToLong(rtType, rTimeRow)
                lastMatch = rHead.copy() // buffer survives iterator reuse
                rHead = null
              } else advancing = false // later key, or future time: stop
            }
          }
          val matched = lastMatch != null &&
            (tol < 0 || lTime - lastMatchTime <= tol)
          numOutputRows += 1
          if (matched) numMatched += 1
          resultProj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinExec {
  /** Time-column value as comparable micros/long (kept off the exec node
    * so task closures capture only this function, never the plan). */
  private[plans] def timeToLong(dt: DataType, row: InternalRow): Long = dt match {
    case TimestampType | LongType => row.getLong(0)
    case IntegerType | DateType => row.getInt(0).toLong
    case other => throw new IllegalArgumentException(
      s"as-of time column must be timestamp/long/int/date, got $other")
  }
}
