package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** User-facing entry for the native AS-OF join ([[graft.plans.AsOfJoinPlan]]):
  * joins each left row to the right row with the largest time ≤ the left
  * time per key (LEFT OUTER; optional tolerance). Unlike the
  * window-composed formulation (Events.evAsof), the result carries the
  * FULL right row, either side may have its own schema, and the plan is
  * a single co-partitioned merge instead of a union + window.
  */
object AsOf {

  /** Native as-of join. `keys` must exist on both sides under the same
    * names; all other column names must be disjoint (rename before the
    * call). `toleranceMicros < 0` = unbounded lookback.
    *
    * Both time columns must be in the same UNIT FAMILY — timestamp/long
    * (micros) or int/date (days) — enforced below; comparing a micros
    * column to a days column would silently produce wrong matches. The
    * tolerance is likewise in the time columns' raw units: microseconds
    * for timestamp/long, days for int/date. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      toleranceMicros: Long = -1L): DataFrame = {
    val spark = left.sparkSession
    Bridge.addStrategy(spark, AsOfJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    // both sides often derive from the same base frame (self-as-of), which
    // would give the children CONFLICTING attribute ids — the analyzer's
    // DeduplicateRelations only repairs that for built-in node types, so
    // mint fresh ids on the right via an alias projection (collapses in
    // the optimizer; costs nothing at runtime)
    val rPlan = right
      .select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    val dup = (lPlan.output.map(_.name).toSet -- keys)
      .intersect(rPlan.output.map(_.name).toSet -- keys)
    require(dup.isEmpty, s"non-key columns must be disjoint, both sides have: $dup")
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found in [${plan.output.map(_.name).mkString(", ")}]"))
    val lt = attr(lPlan, leftTimeCol)
    val rt = attr(rPlan, rightTimeCol)
    def unitFamily(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.LongType => "micros"
      case org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.DateType => "days"
      case other => throw new IllegalArgumentException(
        s"as-of time column must be timestamp/long/int/date, got $other")
    }
    require(unitFamily(lt.dataType) == unitFamily(rt.dataType),
      s"as-of time columns must share a unit family: $leftTimeCol is " +
        s"${lt.dataType} (${unitFamily(lt.dataType)}) but $rightTimeCol is " +
        s"${rt.dataType} (${unitFamily(rt.dataType)}) — cast one side first")
    Bridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      lt, rt, toleranceMicros))
  }

  // ---- registered gate -----------------------------------------------------

  /** Clicks enriched with each user's latest at-or-before purchase via the
    * NATIVE as-of operator (ev_asof_join covers the window-composed
    * formulation; this gate proves the custom plan end to end). The
    * output keeps the matched purchase TIME — deterministic even when
    * several purchases share the as-of instant. */
  private def evAsofNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Events.ev(spark, dir)
      .withColumn("tss", date_trunc("second", col("ts")))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("tss"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tss").as("ptss"))
    asofJoin(clicks, purchases, Seq("user_id"), "tss", "ptss")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("tss")).as("click_ts"),
        unix_timestamp(col("ptss")).as("asof_purchase_ts"))
      .orderBy("event_id")
  }

  private val evAsofNativeSql =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |            DATE_TRUNC('second', ts) AS tss FROM events),
      |c AS (SELECT event_id, user_id, tss FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, tss AS ptss FROM e WHERE event_type = 'purchase')
      |SELECT event_id, user_id,
      | CAST(EPOCH(tss) AS BIGINT) AS click_ts,
      | CAST(EPOCH((SELECT MAX(p.ptss) FROM p
      |             WHERE p.user_id = c.user_id AND p.ptss <= c.tss))
      |   AS BIGINT) AS asof_purchase_ts
      |FROM c ORDER BY event_id""".stripMargin
      // scalar subquery, NOT a GROUP BY over (event_id, user_id, tss):
      // grouping would silently collapse replayed duplicate click rows
      // that the operator (correctly) emits once per left row

  val all: Seq[Q] = Seq(
    Q("ev_asof_native", evAsofNative, Some(evAsofNativeSql)))
}
