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
  /** Commit-metadata tag prefix recording the last applied micro-batch id
    * (suffixed with the caller's `sinkId`). */
  val BatchIdTag = "graft.stream.batchId"

  /** The batch-id commit tag for one logical stream attachment. */
  def batchIdTag(sinkId: String): String = s"$BatchIdTag.$sinkId"

  /** `guardStale = true` additionally filters each micro-batch against
    * the order values the table already stores ([[CdcApply.guardStale]])
    * — the cross-batch completion of `cfg.orderCol`, for streams that
    * replay out of order ACROSS micro-batches. Requires `cfg.orderCol`
    * naming a column that exists in both the stream and the table.
    *
    * RESTART IDEMPOTENCE (exactly-once table effect): foreachBatch is
    * at-least-once — after a crash between the sink's table commit and
    * the checkpoint's own batch commit, the batch is RE-DELIVERED with
    * the same id on restart (the reference's gRPC loop has the same
    * at-least-once window between apply and ack,
    * SparkDestinationStream.java:75-92). Every applied batch records
    * its id in the snapshot's commit metadata
    * ([[TableStore.lastMetaValue]] walks it back through interleaved
    * non-stream commits like compactions); a batch whose id is ≤ the
    * last recorded one was already durably applied and is SKIPPED, so
    * replays never double-apply. Batch ids restart at 0 with a FRESH
    * checkpoint — re-attaching a table to a new checkpoint must pass a
    * new `sinkId` (the tag is scoped per attachment), or the new
    * query's early batches would be mistaken for replays. */
  def attach(spark: SparkSession, stream: DataFrame, store: TableStore,
      cfg: CdcApply.CdcConfig, seqCol: Option[String] = None,
      guardStale: Boolean = false,
      sinkId: String = "default"): DataStreamWriter[Row] = {
    require(!guardStale || cfg.orderCol.nonEmpty,
      "guardStale requires cfg.orderCol")
    val tag = batchIdTag(sinkId)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      import org.apache.spark.sql.functions._
      val lastApplied = store.lastMetaValue(cfg.table, tag)
        .flatMap(s => scala.util.Try(s.toLong).toOption)
      if (lastApplied.exists(_ >= batchId)) () // replayed batch: already durable
      else {
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
        CdcApply.applyEnvelopes(spark, store, cfg, applied,
          commitTags = Map(tag -> batchId.toString))
        ()
      }
    }
  }
}
