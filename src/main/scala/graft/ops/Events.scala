package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables.t
import graft.streaming.StreamOps

/** Event-stream analytics registered through the batch gate. These run the
  * SAME plan functions as the Structured Streaming queries (StreamOps) —
  * batch execution here, streaming execution in StreamingSpec.
  */
object Events {

  /** The events parquet carries TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Scope the legacy nanos-as-long conf to this read only (set,
    * build the eager schema-inferring reader, restore) so the behavior
    * never leaks into other parquet reads in the session, then convert to
    * a µs TimestampType col (truncation matches the oracle's
    * DATE_TRUNC('second') downstream). */
  private[graft] def ev(spark: SparkSession, dir: String) = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = t(spark, dir, "events")
      // materialize the schema now, while the conf is in force
      raw.schema
      raw.schema("ts").dataType match {
        // legacy driver testdata: ns-as-long → truncate to µs TimestampType
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // current driver testdata: µs TIMESTAMP_NTZ (pandas-written,
        // isAdjustedToUTC=false) — watermarks and unix_micros refuse NTZ,
        // so cast to session-zoned TimestampType; the session runs UTC,
        // so every wall value maps to the instant DuckDB computes with
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        // already a µs TimestampType — e.g. MakeScale-synthesized dirs
        case _ => raw
      }
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def evTumbling(spark: SparkSession, dir: String): DataFrame =
    StreamOps.tumblingStats(ev(spark, dir), "1 hour")
      .orderBy("window_start", "event_type")

  private[ops] val evTumblingSql =
    """SELECT CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS window_start,
      | event_type, COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def evSliding(spark: SparkSession, dir: String): DataFrame =
    StreamOps.slidingCounts(ev(spark, dir), "2 hours", "1 hour")
      .orderBy("window_start", "event_type")

  /** Sliding = union of the two aligned hourly phases in plain SQL. */
  private val evSlidingSql =
    """SELECT CAST(EPOCH(w) AS BIGINT) AS window_start, event_type,
      | COUNT(*) AS n_events
      |FROM (
      | SELECT DATE_TRUNC('hour', ts) AS w, event_type FROM events
      | UNION ALL
      | SELECT DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR AS w, event_type FROM events)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Windowed top-k (the streaming trending-items shape): the k most
    * frequent event types per tumbling hour. Composed from the SAME
    * tumbling aggregate the streaming path runs, plus a rank over the
    * tiny per-window aggregate — the window function sorts (windows ×
    * types) rows, never events. Ties break on event_type. */
  private def evWindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("window_start")
      .orderBy(col("n_events").desc, col("event_type"))
    StreamOps.tumblingStats(ev(spark, dir), "1 hour")
      .select(col("window_start"), col("event_type"), col("n_events"))
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= 3)
      .select("window_start", "rank", "event_type", "n_events")
      .orderBy("window_start", "rank")
  }

  private val evWindowTopkSql =
    """SELECT window_start, "rank", event_type, n_events FROM (
      | SELECT window_start, event_type, n_events,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY window_start
      |    ORDER BY n_events DESC, event_type) AS INT) AS "rank"
      | FROM (
      |  SELECT CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS window_start,
      |   event_type, COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2))
      |WHERE "rank" <= 3 ORDER BY window_start, "rank"""".stripMargin

  private def evSessions(spark: SparkSession, dir: String): DataFrame =
    StreamOps.sessionStats(ev(spark, dir), "30 minutes")
      .orderBy("user_id", "session_start")

  /** Gaps-and-islands reproduction of session_window semantics: an event at
    * EXACTLY gap distance still merges (Spark's session end is inclusive of
    * a touching next event — verified empirically at sf0.1, where one exact
    * 30-minute gap exists), so a new session starts only when the previous
    * event is STRICTLY more than 30 min away. */
  private[ops] val evSessionsSql =
    """WITH e AS (
      | SELECT user_id, DATE_TRUNC('second', ts) AS tss, value FROM events),
      |flagged AS (
      | SELECT user_id, tss, value,
      |  CASE WHEN tss - LAG(tss) OVER (PARTITION BY user_id ORDER BY tss)
      |        <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      | FROM e),
      |sess AS (
      | SELECT user_id, tss, value,
      |  SUM(new_session) OVER (PARTITION BY user_id ORDER BY tss
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      | FROM flagged)
      |SELECT user_id, CAST(EPOCH(MIN(tss)) AS BIGINT) AS session_start,
      | COUNT(*) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  private def evDedup(spark: SparkSession, dir: String): DataFrame =
    StreamOps.dedupEvents(ev(spark, dir), streaming = false)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** DISTINCT ON with a full secondary ORDER BY mirrors the batch
    * dedupEvents row_number pick — both engines keep the same survivor even
    * if duplicated event_ids were to differ in payload. */
  private val evDedupSql =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      |FROM (SELECT DISTINCT ON (event_id) event_id, event_type, user_id FROM events
      |      ORDER BY event_id, event_type, user_id, DATE_TRUNC('second', ts))
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** JSON prop extraction from the props column (semi-structured path). */
  private def evProps(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** TRY_CAST (not CAST) mirrors Spark's non-ANSI cast: a valid JSON whose
    * $.k is a non-numeric string must yield NULL on both engines, where a
    * plain DuckDB CAST would raise. */
  private val evPropsSql =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(TRY_CAST(CASE WHEN JSON_VALID(props)
      |   THEN JSON_EXTRACT_STRING(props, '$.k') END AS INT)) AS BIGINT) AS sum_k,
      | MAX(TRY_CAST(CASE WHEN JSON_VALID(props)
      |   THEN JSON_EXTRACT_STRING(props, '$.k') END AS INT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** AS-OF join, composed from built-ins (the preferred path before any
    * custom operator — SURVEY.md §2 mapping): for every click, the most
    * recent prior purchase by the same user. Union the two slices, tag
    * them, and take `last(purchase_ts) IGNORE NULLS` over the preceding
    * window — one shuffle on user_id, no range self-join explosion. */
  private def evAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
      .withColumn("tss", date_trunc("second", col("ts")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tss"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.filter(col("event_type").isin("click", "purchase"))
      .withColumn("purchase_ts",
        when(col("event_type") === "purchase", col("tss")))
      .withColumn("last_purchase",
        last(col("purchase_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("tss")).as("click_ts"),
        unix_timestamp(col("last_purchase")).as("asof_purchase_ts"))
      .orderBy("event_id")
  }

  private val evAsofSql =
    """SELECT event_id, user_id,
      | CAST(EPOCH(tss) AS BIGINT) AS click_ts,
      | CAST(EPOCH(last_purchase) AS BIGINT) AS asof_purchase_ts
      |FROM (
      | SELECT event_id, user_id, event_type, tss,
      |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN tss END IGNORE NULLS)
      |   OVER (PARTITION BY user_id ORDER BY tss, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
      | FROM (SELECT event_id, user_id, event_type, DATE_TRUNC('second', ts) AS tss
      |       FROM events WHERE event_type IN ('click', 'purchase')))
      |WHERE event_type = 'click'
      |ORDER BY event_id""".stripMargin

  /** Pivot: event counts per user pivoted by event type (fixed column set
    * so the schema is deterministic); oracle is conditional aggregation. */
  private def evPivot(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  private val evPivotSql =
    """SELECT user_id,
      | CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      | CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
      | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      | CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Funnel analysis (step i completed within `within` of step i−1's
    * first completion): the standard product-analytics conversion query.
    * Input needs (user_id, event_type, tss). One shuffle total — every
    * per-user step time is a window MIN over the SAME user_id partitioning
    * (sequential projections let each step's window predicate reference
    * the previous step's bound column, and Spark reuses one exchange);
    * the per-user reduction and the k-row unpivot are negligible on top. */
  def funnel(e: DataFrame, steps: Seq[String], within: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy("user_id")
    val staged = steps.zipWithIndex.foldLeft(
      e.filter(col("event_type").isin(steps: _*))) {
      case (df, (step, 0)) =>
        df.withColumn("t1",
          min(when(col("event_type") === step, col("tss"))).over(w))
      case (df, (step, i)) =>
        df.withColumn(s"t${i + 1}",
          min(when(col("event_type") === step &&
            col("tss") >= col(s"t$i") &&
            col("tss") <= col(s"t$i") + expr(s"INTERVAL $within"),
            col("tss"))).over(w))
    }
    val ts = steps.indices.map(i => s"t${i + 1}")
    val perUser = staged.groupBy("user_id")
      .agg(min(ts.head).as(ts.head), ts.tail.map(t => min(t).as(t)): _*)
    val counts = perUser.agg(
      count(col(ts.head)).as("u1"),
      ts.tail.zipWithIndex.map { case (t, i) =>
        count(col(t)).as(s"u${i + 2}") }: _*)
    counts
      .select(explode(array(steps.indices.map(i =>
        struct(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
          col(s"u${i + 1}").as("n_users"))): _*)).as("s"), col("u1"))
      .select(col("s.step"), col("s.step_name"), col("s.n_users"),
        when(col("u1") > 0,
          col("s.n_users").cast(DoubleType) / col("u1")).as("conversion"))
      .orderBy("step")
  }

  private def evFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(
      ev(spark, dir).select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("tss")),
      Seq("view", "click", "purchase"), "24 HOURS")

  private val evFunnelSql =
    """WITH e AS (
      | SELECT user_id, event_type, DATE_TRUNC('second', ts) AS tss
      | FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN tss END)
      |        OVER (PARTITION BY user_id) AS t1 FROM e),
      |s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND tss >= t1
      |        AND tss <= t1 + INTERVAL 24 HOUR THEN tss END)
      |        OVER (PARTITION BY user_id) AS t2 FROM s1),
      |s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tss >= t2
      |        AND tss <= t2 + INTERVAL 24 HOUR THEN tss END)
      |        OVER (PARTITION BY user_id) AS t3 FROM s2),
      |pu AS (SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
      |       FROM s3 GROUP BY user_id),
      |c AS (SELECT COUNT(t1) AS u1, COUNT(t2) AS u2, COUNT(t3) AS u3 FROM pu)
      |SELECT step, step_name, n_users,
      | CASE WHEN u1 > 0 THEN CAST(n_users AS DOUBLE) / u1 END AS conversion
      |FROM (
      | SELECT 1 AS step, 'view' AS step_name, u1 AS n_users, u1 FROM c
      | UNION ALL SELECT 2, 'click', u2, u1 FROM c
      | UNION ALL SELECT 3, 'purchase', u3, u1 FROM c)
      |ORDER BY step""".stripMargin

  /** Cohort retention: users grouped by first-activity day, retention =
    * share of the cohort active again N days later (offsets 0–7). The
    * cohort day is a window MIN on the user_id partitioning (one shuffle),
    * the count-distinct reduces per (cohort, offset), and the cohort-size
    * denominator comes from a window over the TINY aggregate — never a
    * second scan of the events. */
  def retention(e: DataFrame, maxOffset: Int): DataFrame = {
    val w = Window.partitionBy("user_id")
    val counts = e
      .withColumn("cohort_day", min(col("day")).over(w))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffset)
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
    val cw = Window.partitionBy("cohort_day")
    counts
      .withColumn("n_cohort",
        max(when(col("day_offset") === 0, col("n_active"))).over(cw))
      .select(col("cohort_day"), col("day_offset").cast(IntegerType),
        col("n_active"),
        (col("n_active").cast(DoubleType) / col("n_cohort")).as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  private def evRetention(spark: SparkSession, dir: String): DataFrame =
    retention(
      ev(spark, dir).select(col("user_id"), to_date(col("ts")).as("day")), 7)

  private val evRetentionSql =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |wc AS (SELECT user_id, day,
      |        MIN(day) OVER (PARTITION BY user_id) AS cohort_day FROM e),
      |f AS (SELECT user_id, day, cohort_day,
      |       DATEDIFF('day', cohort_day, day) AS day_offset FROM wc),
      |c AS (SELECT cohort_day, day_offset, COUNT(DISTINCT user_id) AS n_active
      |      FROM f WHERE day_offset <= 7 GROUP BY 1, 2)
      |SELECT cohort_day, CAST(day_offset AS INT) AS day_offset, n_active,
      | CAST(n_active AS DOUBLE) /
      |  MAX(CASE WHEN day_offset = 0 THEN n_active END)
      |   OVER (PARTITION BY cohort_day) AS retention
      |FROM c ORDER BY cohort_day, day_offset""".stripMargin

  /** Robust outlier detection per event type: median/MAD from EXACT
    * positional quantiles (integer rank arithmetic over a total order —
    * the q32 pattern; interpolating percentiles and stddev-based z-scores
    * are not reproducible across engines), outlier = |v − median| > 3·MAD
    * in exact DECIMAL arithmetic. The two rank passes shuffle on
    * event_type; the 5-row median/MAD frames broadcast back. */
  def madOutliers(e: DataFrame): DataFrame = {
    import graft.ops.Dets._
    val cw = Window.partitionBy("event_type")
    def medianOf(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("event_type")
        .orderBy(col(valueCol), col("event_id"))
      df.withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("n", count(lit(1)).over(cw))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col(valueCol).as(out))
    }
    val med = medianOf(e, "v", "med")
    val withDev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = medianOf(withDev, "dev", "mad")
    withDev.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        dbl(min("med")).as("median_value"),
        dbl(min("mad")).as("mad"),
        sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_share",
        col("n_outliers").cast(DoubleType) / col("n_events"))
      .orderBy("event_type")
  }

  private def evOutliers(spark: SparkSession, dir: String): DataFrame =
    madOutliers(ev(spark, dir)
      .filter(col("value").isNotNull) // null values rank differently across engines
      .select(col("event_type"), col("event_id"),
        Dets.dec(col("value")).as("v")))

  private val evOutliersSql =
    """WITH e AS (SELECT event_type, event_id,
      |        CAST(value AS DECIMAL(18,2)) AS v
      |       FROM events WHERE value IS NOT NULL),
      |r1 AS (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
      |        COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
      |med AS (SELECT event_type, v AS med FROM r1 WHERE rn = (n + 1) // 2),
      |wd AS (SELECT e.event_type, e.event_id, e.v, med.med,
      |        ABS(e.v - med.med) AS dev
      |       FROM e JOIN med USING (event_type)),
      |r2 AS (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
      |        COUNT(*) OVER (PARTITION BY event_type) AS n FROM wd),
      |mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
      |SELECT wd.event_type, COUNT(*) AS n_events,
      | CAST(MIN(med) AS DOUBLE) AS median_value,
      | CAST(MIN(mad.mad) AS DOUBLE) AS mad,
      | CAST(SUM(CASE WHEN dev > mad.mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      | CAST(SUM(CASE WHEN dev > mad.mad * 3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |   AS outlier_share
      |FROM wd JOIN mad USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Rolling 24 h per-user activity features (a VALUE-range window frame,
    * not a row frame — q26 covers ROWS BETWEEN; this is RANGE BETWEEN,
    * where the frame is defined by the ORDER-BY value, so same-timestamp
    * peers always share a frame): for every event, how many events and how much
    * value the SAME user produced in the trailing 24 hours inclusive.
    * One shuffle on user_id; count/exact-decimal-sum over a value range
    * are order-independent, so the gate is value-exact cross-engine. */
  private def evRolling(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Dets._
    val e = ev(spark, dir).select(col("event_id"), col("user_id"),
      unix_timestamp(date_trunc("second", col("ts"))).as("ts_sec"),
      dec(col("value")).as("v"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
      .rangeBetween(-86399L, Window.currentRow)
    e.withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_24h", dbl(sum(col("v")).over(w)))
      .select("event_id", "user_id", "ts_sec", "n_24h", "sum_24h")
      .orderBy("event_id")
  }

  private val evRollingSql =
    """SELECT event_id, user_id, ts_sec,
      | COUNT(*) OVER w AS n_24h,
      | CAST(SUM(v) OVER w AS DOUBLE) AS sum_24h
      |FROM (SELECT event_id, user_id,
      |       CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS ts_sec,
      |       CAST(value AS DECIMAL(18,2)) AS v FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
      |             RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Spine+join core of the gap fill, over an already-rolled-up daily
    * frame (user_id, day, n_events, sum_value): a distributed date spine
    * (sequence + explode between each user's first and last active day)
    * left-joined back onto the rollup, zero-filling silent days — the
    * standard "fill missing periods" shape without a calendar cross join
    * or a driver loop. The spine generates map-side from the tiny
    * per-user bounds aggregate, so at 100 TB the cost is one shuffle for
    * the daily rollup; spine size is bounded by users × span, never by
    * event volume. Public for the planted fixture tests. */
  def gapFillDaily(daily: DataFrame): DataFrame = {
    val spine = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** Gate: scopes OUTPUT to a deterministic user slice (user_id % 199
    * = 0); counts and exact decimal sums make it value-exact
    * cross-engine. */
  private def evGapFill(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Dets._
    val daily = ev(spark, dir)
      .filter(col("user_id") % 199 === 0)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    gapFillDaily(daily).orderBy("user_id", "day")
  }

  private val evGapFillSql =
    """WITH d AS (
      | SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      | FROM events WHERE user_id % 199 = 0 GROUP BY 1, 2),
      |b AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1),
      |sp AS (SELECT user_id, CAST(UNNEST(GENERATE_SERIES(
      |         CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
      |         INTERVAL 1 DAY)) AS DATE) AS day
      |       FROM b)
      |SELECT sp.user_id, sp.day,
      | COALESCE(n_events, 0) AS n_events,
      | COALESCE(sum_value, 0.0) AS sum_value
      |FROM sp LEFT JOIN d ON sp.user_id = d.user_id AND sp.day = d.day
      |ORDER BY 1, 2""".stripMargin

  /** Event-transition matrix (first-order Markov chain over each user's
    * event stream): per (from, to) event-type pair, transition counts
    * and the conditional probability P(to | from). One LEAD window per
    * user — the shuffle carries (user, ts, type) triples partitioned by
    * user, so at 100 TB the sort is bounded by a user's history, never
    * global — then a tiny (|types|²) aggregate. Probabilities are exact
    * int/int divisions. Ties on ts break by event_id (total order, so
    * both engines pick the same successor). */
  def transitionMatrix(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("from_total",
        sum("n").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast(DoubleType) / col("from_total")).as("p"))
  }

  private def evMarkov(spark: SparkSession, dir: String): DataFrame =
    transitionMatrix(ev(spark, dir)).orderBy("from_type", "to_type")

  private val evMarkovSql =
    """WITH seq AS (
      | SELECT user_id, event_type AS from_type,
      |  LEAD(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS to_type
      | FROM events),
      |c AS (SELECT from_type, to_type, COUNT(*) AS n
      |      FROM seq WHERE to_type IS NOT NULL
      |      GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n,
      | CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("ev_markov", evMarkov, Some(evMarkovSql)),
    Q("ev_tumbling_window", evTumbling, Some(evTumblingSql)),
    Q("ev_sliding_window", evSliding, Some(evSlidingSql)),
    Q("ev_window_topk", evWindowTopk, Some(evWindowTopkSql)),
    Q("ev_session_windows", evSessions, Some(evSessionsSql)),
    Q("ev_dedup", evDedup, Some(evDedupSql)),
    Q("ev_json_props", evProps, Some(evPropsSql)),
    Q("ev_asof_join", evAsof, Some(evAsofSql)),
    Q("ev_pivot", evPivot, Some(evPivotSql)),
    Q("ev_rolling_24h", evRolling, Some(evRollingSql)),
    Q("ev_gap_fill", evGapFill, Some(evGapFillSql)),
    Q("ev_funnel", evFunnel, Some(evFunnelSql)),
    Q("ev_retention", evRetention, Some(evRetentionSql)),
    Q("ev_outliers", evOutliers, Some(evOutliersSql)))
}
