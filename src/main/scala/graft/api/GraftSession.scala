package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.cdc._
import graft.tables.TableStore

/** Session builder with the engine's recommended configuration — what the
  * reference assembles in SparkUtils.create (SparkUtils.java:36-58), minus
  * the Iceberg/S3 wiring this environment replaces with TableStore.
  */
object GraftSession {
  def builder(appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}

/** Streaming CDC sink: attach a Structured Streaming source of CDC
  * envelopes to a managed table via foreachBatch — the streaming analogue
  * of the reference's record stream (SURVEY.md S1), one atomic snapshot
  * commit per micro-batch.
  *
  * Expected input columns: op STRING, key STRING (JSON object),
  * payload STRING (JSON object, null for deletes), and optionally a
  * caller-named sequence column for cross-partition last-write-wins.
  *
  * ORDERING CONTRACT: without `seqCol`, last-write-wins order within a
  * micro-batch follows partition index then arrival order inside each
  * partition (monotonically_increasing_id) — two updates to the same key
  * in DIFFERENT partitions of one batch resolve arbitrarily. Sources that
  * carry an offset/LSN should pass it as `seqCol`.
  */
object CdcStreamSink {
  /** `guardStale = true` additionally filters each micro-batch against
    * the order values the table already stores ([[CdcApply.guardStale]])
    * — the cross-batch completion of `cfg.orderCol`, for streams that
    * replay out of order ACROSS micro-batches. Requires `cfg.orderCol`
    * naming a column that exists in both the stream and the table. */
  def attach(spark: SparkSession, stream: DataFrame, store: TableStore,
      cfg: CdcApply.CdcConfig, seqCol: Option[String] = None,
      guardStale: Boolean = false): DataStreamWriter[Row] = {
    require(!guardStale || cfg.orderCol.nonEmpty,
      "guardStale requires cfg.orderCol")
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      import org.apache.spark.sql.functions._
      // fully distributed: the micro-batch is never collected
      val seq = seqCol.map(c => col(c).cast("long"))
        .getOrElse(monotonically_increasing_id())
      // a configured source-time order column (cfg.orderCol, e.g. an
      // opencdc.createdAt-shaped metadata timestamp) rides along so
      // applyEnvelopes can resolve out-of-order deliveries; backticks keep
      // a dotted name one literal column
      val ordCols = cfg.orderCol.toSeq.map(c => col(s"`$c`"))
      val env = batch
        .withColumn("__seq", seq)
        .select(Seq(col("__seq"), lower(col("op")).as("__op"),
          col("key").as("__key"), col("payload").as("__payload")) ++ ordCols: _*)
      val applied =
        if (guardStale) CdcApply.guardStale(spark, store, cfg, env) else env
      CdcApply.applyEnvelopes(spark, store, cfg, applied); ()
    }
  }
}
