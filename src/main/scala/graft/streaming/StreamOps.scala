package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming analytics over the `events` stream (streaming analogue of the
  * reference's record stream, SURVEY.md §2 row S1).
  *
  * Every transform here is expressed against an unbounded-table plan —
  * `window`/`session_window` aggregations with event-time watermarks — so
  * the SAME function runs in a batch job (driver correctness gate) and in a
  * Structured Streaming query (`readStream`/`writeStream`, exercised with
  * MemoryStream in StreamingSpec). `withWatermark` is a no-op on batch
  * inputs, which is what makes the single-source-of-truth possible.
  */
object StreamOps {

  /** Event-time watermarked source prep: seconds-truncated event time
    * (parquet carries ns; Spark is µs; second-precision keeps every
    * downstream aggregate bit-identical with the DuckDB oracle). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ts_sec", date_trunc("second", col("ts")))
      .withWatermark("ts_sec", "10 minutes")

  /** Tumbling-window counts/sums per event type. (Note for composing
    * after another stateful operator: Spark forbids REDEFINING the
    * watermark mid-plan, and chained stateful operators apply
    * cross-operator late-record filtering — materialize the upstream
    * stage and aggregate in batch instead, as st_dedup does.) */
  def tumblingStats(events: DataFrame, width: String): DataFrame =
    withEventTime(events)
      .groupBy(window(col("ts_sec"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window event rate per type. */
  def slidingCounts(events: DataFrame, width: String, slide: String): DataFrame =
    withEventTime(events)
      .groupBy(window(col("ts_sec"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"))

  /** Session windows per user: events within `gap` of each other merge into
    * one session (native session_window — works batch AND streaming). */
  def sessionStats(events: DataFrame, gap: String): DataFrame =
    sessionCore(withEventTime(events), gap)

  /** Session windows WITHOUT a watermark — for Complete-output-mode
    * streaming, where the full result is re-emitted every trigger and
    * state must be retained forever anyway. With a watermark, sessions
    * that close as the watermark advances are EVICTED from the state
    * store between micro-batches, so the final Complete output would
    * silently lose every already-closed session (observed empirically:
    * the driver's multi-batch st_session run kept only the open tail).
    * Bounded-state streaming (Append/Update) should use [[sessionStats]]
    * and accept watermark-late data loss — that path is exercised in
    * StreamingSpec. */
  def sessionStatsUnbounded(events: DataFrame, gap: String): DataFrame =
    sessionCore(events.withColumn("ts_sec", date_trunc("second", col("ts"))), gap)

  private def sessionCore(prepped: DataFrame, gap: String): DataFrame =
    prepped
      .groupBy(session_window(col("ts_sec"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming CONTENT dedup for a document stream: drop any doc whose
    * token-normalized content hash was already seen inside the watermark
    * window. The key is a 60-bit md5-derived hash of the whitespace-
    * normalized token join (graft.ops.PortableHash.h60 — NOT the 32-bit
    * rolling fingerprint, whose birthday bound would silently merge
    * distinct docs after ~77k per window), so the state store keys on 8
    * bytes, never the text, and the watermark bounds it. This is the
    * streaming half of the exact-dedup training-data pass (batch half:
    * dd_exact). `eventTimeCol` must be an event-time timestamp column. */
  def dedupDocsByContent(docs: DataFrame, eventTimeCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("__fp", graft.ops.PortableHash.h60(
        concat_ws(" ", graft.ops.Text.tokens(col("text")))))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")

  /** Exactly-once style dedup on event_id (streaming:
    * dropDuplicatesWithinWatermark keeps state bounded). The batch path
    * picks the (event_type, user_id, ts_sec)-minimal row per event_id via
    * row_number, not dropDuplicates, so the survivor is DETERMINISTIC even
    * when replayed ids carry differing payloads — required for a stable
    * cross-engine oracle. */
  def dedupEvents(events: DataFrame, streaming: Boolean): DataFrame = {
    val e = withEventTime(events)
    if (streaming) e.dropDuplicatesWithinWatermark(Seq("event_id"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_id")
        .orderBy(col("event_type"), col("user_id"), col("ts_sec"))
      e.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }
}
