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
  *   - Offsets are log positions `(version, file index)` — see
  *     [[GraftSourceOffset]]: restart from a checkpoint resumes at
  *     exactly the recorded position (the file sequence is
  *     deterministic, so re-delivered ranges are byte-identical).
  *   - ADMISSION CONTROL: `maxRowsPerTrigger` / `maxFilesPerTrigger` /
  *     `maxBytesPerTrigger` split the initial snapshot and large
  *     catch-up ranges across micro-batches. Without a cap, the first
  *     trigger on a 100 TB table is one monolithic job with no
  *     incremental checkpoint — with one, each trigger commits a
  *     bounded slice and a crash retries only that slice (the
  *     Delta/Iceberg `maxFilesPerTrigger` shape). Row and byte sizing
  *     come from the snapshot's recorded per-file counts and lengths —
  *     one metadata read, no footer opened.
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
    new GraftTableSink(store, table, sinkId,
      maintainViews = parameters.get("maintainViews")
        .exists(_.trim.equalsIgnoreCase("true")))
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
    val base = schema.getOrElse(store.schema(table))
    val out =
      if (parameters.get("changeFeed").exists(_.trim.toBoolean))
        GraftTableSource.changeSchema(base)
      else base
    (shortName(), out)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (store, table) = storeOf(ctx, parameters)
    val changeFeed = parameters.get("changeFeed").exists(_.trim.toBoolean)
    val startVersion = parameters.get("startVersion").map(_.trim.toInt)
    new GraftTableSource(ctx.sparkSession, store, table, startVersion,
      parameters.get("maxRowsPerTrigger").map(_.trim.toLong),
      parameters.get("maxFilesPerTrigger").map(_.trim.toInt),
      changeFeed, Some(metadataPath),
      parameters.get("maxBytesPerTrigger").map(_.trim.toLong))
  }
}

/** Append-only streaming sink: one atomic snapshot per micro-batch,
  * batch id in commit metadata for restart idempotence. The micro-batch
  * is handed to the distributed append via its ALREADY-PLANNED
  * incremental-execution RDD ([[Bridge.batchFrame]]) — never collected,
  * never re-planned.
  *
  * `maintainViews`: fold the batch into every registered materialized
  * view of the sink table INSIDE the same transaction — the append and
  * all view folds publish as ONE atomic multi-table commit
  * ([[TableStore.transaction]]), so a reader can never see the facts
  * ahead of the rollup. Exactly-once composes: a crash between the
  * transaction's publish and the checkpoint commit re-delivers the
  * batch, the batch-id tag skips the APPEND, and with nothing new
  * appended the views' applied-version interval is empty — nothing
  * folds twice. At 100 TB this turns "refresh the dashboard rollups"
  * from a scheduled scan into a per-batch delta whose cost tracks the
  * batch, not the table. */
final class GraftTableSink(store: TableStore, table: String,
    sinkId: String, maintainViews: Boolean = false)
  extends org.apache.spark.sql.execution.streaming.Sink {

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
    else if (!maintainViews)
      store.append(table, Bridge.batchFrame(data),
        meta = Map(tag -> batchId.toString))
    else store.transaction { tx =>
      tx.append(table, Bridge.batchFrame(data),
        meta = Map(tag -> batchId.toString))
      // read-your-writes: the folds see the buffered append and publish
      // with it atomically
      graft.tables.MaterializedView.refreshAllFor(tx, table)
      ()
    }
  }

  override def toString: String = s"GraftTableSink[$table]"
}

/** Source offset: the log position `(version, phase, filesConsumed)`.
  *
  * The table's change log is a DETERMINISTIC file sequence — the initial
  * snapshot's manifest list (phase `snap`), then every later committed
  * version's appended-sidecar list, each in recorded order. An offset
  * marks "the first `files` entries of `version`'s list are consumed";
  * a fully-consumed version advances to the next committed version.
  * Admission control (`maxRowsPerTrigger` / `maxFilesPerTrigger`) just
  * caps how far along this sequence one trigger's end offset may move —
  * restart from any checkpointed offset re-reads exactly the same
  * files, so splitting changes batch BOUNDARIES, never content.
  * A bare integer offset (pre-admission-control checkpoints) parses as
  * "version fully consumed". */
private[streaming] final case class GraftSourceOffset(version: Int,
    snap: Boolean, files: Int) extends Offset {
  override def json: String =
    s"""{"version":$version,"snap":$snap,"files":$files}"""
}

private[streaming] object GraftSourceOffset {
  val AllFiles: Int = Int.MaxValue

  def parse(o: Offset): GraftSourceOffset = parse(o.json)

  def parse(s: String): GraftSourceOffset = {
    val t = s.trim
    if (t.forall(c => c.isDigit || c == '-'))
      GraftSourceOffset(t.toInt, snap = false, AllFiles) // legacy: whole version
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(t)
      GraftSourceOffset(node.get("version").intValue(),
        Option(node.get("snap")).exists(_.booleanValue()),
        node.get("files").intValue())
    }
  }
}

object GraftTableSource {
  /** Change-feed output schema: the table's columns plus the CDF labels. */
  private[streaming] def changeSchema(base: StructType): StructType =
    StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField(TableStore.ChangeTypeCol,
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField(TableStore.CommitVersionCol,
        org.apache.spark.sql.types.IntegerType, nullable = false)))

  /** Pseudo file-list entry standing for "this version's net change as
    * ONE admission unit" — a mutation commit's delta is a masked-read
    * difference, not a file list, so it cannot split across triggers.
    * Contains '/'-free ':' characters no real rel path starts with. */
  private[streaming] val NetChangeToken: String = "::netchange::"
}

final class GraftTableSource(spark: SparkSession, store: TableStore,
    table: String, startVersion: Option[Int],
    maxRowsPerTrigger: Option[Long] = None,
    maxFilesPerTrigger: Option[Int] = None,
    changeFeed: Boolean = false,
    metadataPath: Option[String] = None,
    maxBytesPerTrigger: Option[Long] = None) extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import GraftSourceOffset.AllFiles
  import GraftTableSource.NetChangeToken

  override def schema: StructType =
    if (changeFeed) GraftTableSource.changeSchema(store.schema(table))
    else store.schema(table)

  private def capped: Boolean =
    maxRowsPerTrigger.isDefined || maxFilesPerTrigger.isDefined ||
      maxBytesPerTrigger.isDefined

  /** File list of one log position's version. In change-feed mode a
    * pure-append version lists its appended files (splittable inserts);
    * a mutation version is ONE [[GraftTableSource.NetChangeToken]] unit
    * whose batch is the masked-read net change. */
  private def listOf(version: Int, snap: Boolean): Seq[String] =
    if (changeFeed) {
      require(!snap, "change feed never delivers a snapshot phase " +
        "(startVersion is required)")
      store.commitAppendedOnly(table, version) match {
        case Some(rels) => rels
        case None => Seq(NetChangeToken)
      }
    } else if (snap) store.relPathsOf(table, version)
    else store.appendedRelPathsOf(table, version).getOrElse(
      // legacy commit without a sidecar: fall back to the file-set diff
      // against its parent (exact for append-only legacy history)
      {
        val parent = store.commitParent(table, version).getOrElse(version - 1)
        val prev =
          if (parent <= 0) Set.empty[String]
          else store.relPathsOf(table, parent).toSet
        store.relPathsOf(table, version).filterNot(prev)
      })

  /** The log entries after `from`, up to head: (version, snap, files). */
  private def pendingAfter(from: GraftSourceOffset,
      head: Int): Seq[(Int, Boolean, Seq[String])] = {
    val cur = {
      val l = listOf(from.version, from.snap)
      if (from.files >= l.size) Nil
      else Seq((from.version, from.snap, l.drop(from.files)))
    }
    val later = store.committedVersionsBetween(table, from.version, head)
      .map(v => (v, false, listOf(v, snap = false)))
      .filter(_._3.nonEmpty)
    cur ++ later
  }

  /** Where a fresh query (no checkpoint) starts reading. A resumed
    * query never gets here — its position comes from the offset log, so
    * `startVersion` is only needed (and only honored) on first start. */
  private def origin(head: Int): GraftSourceOffset = startVersion match {
    // tail-from: snapshot sv itself is NOT delivered, only later appends
    case Some(sv) => GraftSourceOffset(sv, snap = false, AllFiles)
    // fresh query: the whole snapshot at the current head, from file 0
    case None =>
      require(!changeFeed,
        "changeFeed=true needs startVersion on first start: the feed " +
          "tails CHANGES after a known snapshot — delivering a 100 TB " +
          "initial state as 'inserts' is a plain table-source read, not " +
          "a change feed (a checkpoint resume needs no startVersion)")
      GraftSourceOffset(head, snap = true, 0)
  }

  /** The origin offset, pinned under the source's checkpoint metadata
    * path on FIRST start (the KafkaSource initial-offset pattern): the
    * offset log only records batch END positions, so replaying batch 0
    * after a restart needs the original start position persisted
    * somewhere durable. With it, a resumed query reconstructs batch 0
    * without re-supplying `startVersion`, and a fresh snapshot query
    * replays batch 0 against the SAME head it first saw even if the
    * table advanced before the crash. */
  private lazy val pinnedOrigin: GraftSourceOffset = metadataPath match {
    case None => origin(availableNowHead.getOrElse(store.currentVersion(table)))
    case Some(mp) =>
      val hp = new org.apache.hadoop.fs.Path(mp, "graft-origin")
      val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(hp)) {
        val in = fs.open(hp)
        val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        GraftSourceOffset.parse(s)
      } else {
        val o = origin(availableNowHead.getOrElse(store.currentVersion(table)))
        fs.mkdirs(hp.getParent)
        val out = fs.create(hp, false) // one writer per checkpoint dir
        try out.write(o.json.getBytes("UTF-8")) finally out.close()
        o
      }
  }

  /** True when a pinned origin already exists for this checkpoint —
    * i.e. the query ran before. Checkpoints from before this feature
    * have none; their batch-0 replay keeps the legacy reconstruction. */
  private def hasPinnedOrigin: Boolean = metadataPath.exists { mp =>
    val hp = new org.apache.hadoop.fs.Path(mp, "graft-origin")
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  /** With [[SupportsAdmissionControl]] implemented, Spark drives
    * [[latestOffset]] and never calls this (FileStreamSource contract). */
  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "getOffset is not used with SupportsAdmissionControl; " +
        "Spark calls latestOffset(start, limit)")

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    (maxRowsPerTrigger, maxFilesPerTrigger) match {
      case (Some(r), _)    => ReadLimit.maxRows(r)
      case (None, Some(f)) => ReadLimit.maxFiles(f)
      case _               => ReadLimit.allAvailable()
    }
  }

  /** Trigger.AvailableNow: pin the drain target at prepare time; capped
    * batches then walk up to exactly this head across as many triggers
    * as the caps require, and the query stops there. */
  @volatile private var availableNowHead: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(store.currentVersion(table))

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val head = availableNowHead.getOrElse(store.currentVersion(table))
    if (startVersion.exists(head <= _)) return null
    val from: GraftSourceOffset = Option(start)
      .map(o => GraftSourceOffset.parse(
        o.asInstanceOf[org.apache.spark.sql.connector.read.streaming.Offset].json))
      .getOrElse(pinnedOrigin)
    val pending: Seq[(Int, Boolean, Seq[String])] = pendingAfter(from, head)
    if (pending.isEmpty) return null
    if (!capped) {
      val (v, s, _) = pending.last
      return GraftSourceOffset(v, s, listOf(v, s).size)
    }
    // admission control: walk the pending sequence accumulating files
    // until a cap trips; always admit at least one file so progress is
    // guaranteed. Row counts come from each version's consolidated
    // stats; a file without one conservatively counts as the row cap.
    val maxR = maxRowsPerTrigger.getOrElse(Long.MaxValue)
    val maxF = maxFilesPerTrigger.getOrElse(Int.MaxValue)
    val maxB = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    var rows = 0L
    var nfiles = 0
    var bytes = 0L
    var endOff: GraftSourceOffset = null
    val it = pending.iterator
    var done = false
    while (it.hasNext && !done) {
      val (v, s, rels) = it.next()
      val counts = store.fileRowCounts(table, v)
      val lens = store.fileByteLengths(table, v)
      val consumedAlready = listOf(v, s).size - rels.size
      var taken = 0
      val rit = rels.iterator
      while (rit.hasNext && !done) {
        val rel = rit.next()
        val r = counts.getOrElse(rel, maxR)
        val b = lens.getOrElse(rel, maxB)
        if (nfiles > 0 && (rows + r > maxR || nfiles + 1 > maxF ||
            bytes + b > maxB)) done = true
        else {
          rows += r; nfiles += 1; bytes += b; taken += 1
          endOff = GraftSourceOffset(v, s, consumedAlready + taken)
        }
      }
    }
    endOff
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val e = GraftSourceOffset.parse(end)
    val from = start.map(GraftSourceOffset.parse).getOrElse {
      if (hasPinnedOrigin) pinnedOrigin
      else startVersion match { // legacy checkpoint: no pinned origin
        case Some(sv) => GraftSourceOffset(sv, snap = false, AllFiles)
        case None     => GraftSourceOffset(e.version, snap = true, 0)
      }
    }
    // files strictly after `from`, capped at `e`'s position
    val segs = pendingAfter(from, e.version)
      .filter { case (v, _, _) => v <= e.version }
      .map { case (v, s, rels) =>
        if (v == e.version && e.files != AllFiles) {
          val consumedAlready = listOf(v, s).size - rels.size
          (v, s, rels.take(math.max(0, e.files - consumedAlready)))
        } else (v, s, rels)
      }
      .filter(_._3.nonEmpty)
    val frames = segs.map { case (v, s, rels) =>
      if (changeFeed) {
        import org.apache.spark.sql.functions.lit
        if (rels == Seq(NetChangeToken)) store.changesOfVersion(table, v)
        else store.readAppendedRels(table, rels)
          .withColumn(TableStore.ChangeTypeCol, lit("insert"))
          .withColumn(TableStore.CommitVersionCol, lit(v))
      }
      else if (s) store.readRelsMasked(table, rels, v)
      else store.readAppendedRels(table, rels)
    }
    val batch =
      if (frames.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema)
      else frames.reduce(_ unionByName _)
    Bridge.streamingFrame(batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[$table]"
}
