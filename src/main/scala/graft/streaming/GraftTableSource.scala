package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.tables.TableStore

/** Structured Streaming SOURCE over a managed table — the table-as-log
  * complement of [[graft.api.CdcStreamSink]] (table as sink):
  *
  * {{{
  * spark.readStream.format("graft-table")
  *   .option("root", "/data/tables").option("table", "orders")
  *   .load()
  * }}}
  *
  * Semantics (the Delta/Iceberg streaming-read shape):
  *   - The FIRST micro-batch is the full snapshot at the version the
  *     offset log records (a consistent read through the zone-map index,
  *     with pending merge-on-read deletes applied).
  *   - Every later micro-batch is the rows APPENDED in the offset range
  *     `(start, end]`, served from the per-commit appended sidecars —
  *     so a compaction between batches contributes NOTHING (no
  *     re-delivery of rewritten rows), and an expired-but-unconsumed
  *     append fails loudly instead of silently skipping rows.
  *   - Offsets are snapshot versions: restart from a checkpoint resumes
  *     at exactly the recorded version (the sidecar walk is
  *     deterministic, so re-delivered ranges are byte-identical).
  *   - Append-only contract: rows REMOVED by deletes/merges after the
  *     initial snapshot are not retracted (use [[TableStore.diffVersions]]
  *     or the CDC path for net changes). `startVersion` tails from a
  *     known snapshot instead of delivering the initial state.
  *
  * The reference's stream flows INTO the table (gRPC records,
  * `SparkDestinationStream.java:70-85`); this source closes the loop so
  * downstream jobs consume the table as a stream with exactly-once
  * offsets instead of rescanning it. */
final class GraftTableSourceProvider
  extends StreamSourceProvider with StreamSinkProvider
  with DataSourceRegister {

  override def shortName(): String = "graft-table"

  /** Structured Streaming SINK into a managed table — append-only
    * exactly-once:
    *
    * {{{
    * df.writeStream.format("graft-table")
    *   .option("root", "/data/tables").option("table", "orders")
    *   .option("sinkId", "ingest-1")   // scope of batch-id idempotence
    *   .start()
    * }}}
    *
    * Each micro-batch is ONE atomic snapshot commit whose metadata
    * records the batch id (same restart-idempotence contract as
    * [[graft.api.CdcStreamSink]]: a re-delivered batch after a crash
    * between table commit and checkpoint commit is skipped, so the
    * at-least-once foreachBatch-style delivery becomes exactly-once
    * table effect). The table is created from the stream schema on
    * first use. Append output mode only — updates belong to the CDC
    * sink, which resolves keys. */
  override def createSink(ctx: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-table sink is append-only, got $outputMode " +
        "(keyed upserts go through CdcStreamSink)")
    val (store, table) = storeOf(ctx, parameters)
    // Idempotence scope: an explicit sinkId, else one DERIVED from the
    // query's checkpoint location. A constant default would make two
    // independent queries (separate checkpoints) appending to the same
    // table share one batch-id scope — the query whose batch ids lag the
    // other's would have every batch silently skipped as a "replay".
    // Checkpoint-derived scopes collide exactly when the batch-id
    // sequences do (same checkpoint = same query lineage), which is the
    // one case skipping is correct.
    val sinkId = parameters.get("sinkId")
      .orElse(parameters.get("checkpointLocation").map { p =>
        "ckpt-" + java.security.MessageDigest.getInstance("MD5")
          .digest(p.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(12)
      })
      .getOrElse("append")
    new GraftTableSink(store, table, sinkId)
  }

  private def storeOf(ctx: SQLContext,
      parameters: Map[String, String]): (TableStore, String) = {
    val root = parameters.getOrElse("root",
      sys.error("graft-table source needs option 'root'"))
    val table = parameters.getOrElse("table",
      sys.error("graft-table source needs option 'table'"))
    (new TableStore(ctx.sparkSession, root), table)
  }

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (store, table) = storeOf(ctx, parameters)
    (shortName(), schema.getOrElse(store.schema(table)))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (store, table) = storeOf(ctx, parameters)
    new GraftTableSource(ctx.sparkSession, store, table,
      parameters.get("startVersion").map(_.trim.toInt))
  }
}

/** Append-only streaming sink: one atomic snapshot per micro-batch,
  * batch id in commit metadata for restart idempotence. The micro-batch
  * is handed to the distributed append via its ALREADY-PLANNED
  * incremental-execution RDD ([[Bridge.batchFrame]]) — never collected,
  * never re-planned. */
final class GraftTableSink(store: TableStore, table: String,
    sinkId: String) extends org.apache.spark.sql.execution.streaming.Sink {

  private val tag = s"graft.stream.appendBatchId.$sinkId"

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (!store.exists(table))
      store.create(table, data.schema, overwrite = false)
    val lastApplied = store.lastMetaValue(table, tag)
      .flatMap(s => scala.util.Try(s.toLong).toOption)
    // A crash-window replay re-delivers the LAST committed batch, so a
    // legitimate skip sees lastApplied == batchId (or barely above). A
    // FRESH query starting at batch 0 against a scope that already
    // recorded later batches is a different query sharing the sinkId —
    // skipping would silently drop its entire stream. Fail loudly.
    if (batchId == 0 && lastApplied.exists(_ > 0))
      throw new IllegalStateException(
        s"graft-table sink scope '$sinkId' on table $table has already " +
          s"committed batch ${lastApplied.get}, but this query is " +
          "delivering batch 0 — two independent queries are sharing one " +
          "sinkId (set a distinct sinkId per query, or let it derive " +
          "from checkpointLocation)")
    if (lastApplied.exists(_ >= batchId)) () // replay: already durable
    else store.append(table, Bridge.batchFrame(data),
      meta = Map(tag -> batchId.toString))
  }

  override def toString: String = s"GraftTableSink[$table]"
}

final class GraftTableSource(spark: SparkSession, store: TableStore,
    table: String, startVersion: Option[Int]) extends Source {

  override def schema: StructType = store.schema(table)

  /** Offsets are committed snapshot versions. */
  override def getOffset: Option[Offset] = {
    val v = store.currentVersion(table)
    // with startVersion, nothing to deliver until the table moves past it
    if (startVersion.exists(v <= _)) None else Some(LongOffset(v.toLong))
  }

  private def versionOf(o: Offset): Int = o.json.trim.toInt

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val e = versionOf(end)
    val batch = start match {
      case Some(s) => store.readAppendedBetween(table, versionOf(s), e)
      case None => startVersion match {
        case Some(sv) => store.readAppendedBetween(table, sv, e)
        // first batch of a fresh query: the full consistent snapshot
        case None => store.readVersion(table, e)
      }
    }
    Bridge.streamingFrame(batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[$table]"
}
