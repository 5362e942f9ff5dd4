package graft.api

import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.SparkSession
import graft.cdc._
import graft.tables.TableStore

/** Library-facing ingest API with the reference connector's lifecycle and
  * guarantees, minus the wire protocol (SURVEY.md §0: the gRPC plumbing is
  * the reference's transport, not its engine):
  *
  *   Configure → Start → Open(stream) → write records → Stop/Teardown
  *   (reference DestinationService.java:39-113)
  *
  * Acks: every accepted record's `position` is returned after its write is
  * durably committed — the same at-least-once contract as the reference's
  * `responseWith(position)` (SparkDestinationStream.java:75,87-92, W4).
  * Errors surface as `Failure` with the decode/validation cause, mirroring
  * the gRPC `onError` path (:264-270).
  */
object Destination {

  /** Connector-spec analogue (reference SpecifierService.java:42-146):
    * parameter inventory with required/validation metadata, so callers can
    * introspect the config surface programmatically. `inclusion` mirrors the
    * reference's TYPE_INCLUSION validations (catalog-impl whitelist,
    * AWS-region whitelist — SpecifierService.java:62-146): a non-empty list
    * restricts the parameter to exactly those values. */
  final case class ParamSpec(name: String, required: Boolean,
      description: String, inclusion: Seq[String] = Nil)

  val name = "graft-table"
  val version = "v0.1.0"

  val parameters: Seq[ParamSpec] = Seq(
    ParamSpec("store.root", required = true,
      "Root URI of the managed TableStore (file:/hdfs:/s3a: or schemeless local path)"),
    ParamSpec("table", required = true,
      "Target table name (must already exist — schema is catalog-owned)"),
    ParamSpec("key.columns", required = true,
      "Comma-separated key column names for delete/update matching"),
    ParamSpec("batch.validation", required = false,
      "Record validation scope: 'strict' rejects a batch on ANY invalid " +
        "record (reference per-record semantics); 'net-only' validates only " +
        "the per-key net winners (faster on large replays; a malformed " +
        "record that loses last-write-wins cannot fail the batch)",
      inclusion = Seq("strict", "net-only")),
    ParamSpec("maintenance.auto", required = false,
      "Run the maintain_deletes policy after each committed write: a " +
        "resident CDC stream commits one equality tombstone sidecar per " +
        "batch, and without maintenance masked-read cost grows per entry " +
        "until the SPJ mask budget fallback. Maintenance commits run " +
        "AFTER the write is durable — its failure never fails an ack " +
        "(inspect lastMaintenance)",
      inclusion = Seq("true", "false")),
    ParamSpec("maintenance.max_entries", required = false,
      "maintain_deletes entry-count budget (default 8)"),
    ParamSpec("maintenance.max_bytes", required = false,
      "maintain_deletes pending-sidecar byte budget (default half the " +
        "per-task SPJ mask budget)"),
    ParamSpec("maintenance.files", required = false,
      "Also bin-pack undersized data files after each committed write " +
        "(rewrite_small_files policy): a resident CDC stream commits one " +
        "small file per batch, and without packing scan task counts grow " +
        "per batch. Cheap when nothing qualifies (driver-side manifest " +
        "check, no job); failure never fails an ack (inspect " +
        "lastFilePack)",
      inclusion = Seq("true", "false")),
    ParamSpec("maintenance.target_bytes", required = false,
      "rewrite_small_files target file size (default 128 MB — one packed " +
        "file per scan split)"),
    ParamSpec("maintenance.min_input_files", required = false,
      "minimum undersized siblings in a partition dir before auto-pack " +
        "rewrites them (default 5, Iceberg's min-input-files): bounds " +
        "write amplification of the resident packed file to one rewrite " +
        "per min_input_files-1 new small files instead of every ack"))

  /** Passthrough namespace, the analogue of the reference's `catalog.*`
    * properties (DestinationConfig.java:44,95-105): every `hadoop.`-prefixed
    * parameter is stripped of the prefix and applied to the store's Hadoop
    * configuration — e.g. `hadoop.fs.s3a.endpoint`, `hadoop.fs.s3a.access.key`
    * (the role the reference's `s3.*` params play). Unknown keys OUTSIDE the
    * namespace are rejected. */
  val passthroughPrefix = "hadoop."

  final case class Config(storeRoot: String, table: String, keyCols: Seq[String],
      validation: String = "strict", hadoopProps: Map[String, String] = Map.empty,
      autoMaintain: Boolean = false, maintainMaxEntries: Int = 8,
      maintainMaxBytes: Long = graft.tables.TableStore.SpjMaskMaxBytes / 2,
      maintainFiles: Boolean = false,
      maintainTargetBytes: Long = graft.tables.TableStore.DefaultTargetFileBytes,
      maintainMinInputFiles: Int = 5)

  /** Required-key + inclusion validation with exact-cause errors (reference
    * DestinationConfig.java:45-49,110-118 and its unit tests). */
  def configure(params: Map[String, String]): Try[Config] = Try {
    def req(k: String): String = params.get(k).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(s"required parameter missing: $k"))
    val unknown = params.keySet
      .filterNot(_.startsWith(passthroughPrefix))
      .diff(parameters.map(_.name).toSet)
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        s"unknown parameters: ${unknown.toSeq.sorted.mkString(", ")}")
    parameters.filter(_.inclusion.nonEmpty).foreach { p =>
      params.get(p.name).foreach { v =>
        if (!p.inclusion.contains(v))
          throw new IllegalArgumentException(
            s"parameter ${p.name} value '$v' not in [${p.inclusion.mkString(", ")}]")
      }
    }
    val hadoopProps = params.collect {
      case (k, v) if k.startsWith(passthroughPrefix) =>
        k.stripPrefix(passthroughPrefix) -> v
    }
    def posInt(k: String, d: Int): Int = params.get(k).map { v =>
      val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"parameter $k must be an integer, got '$v'"))
      if (n <= 0) throw new IllegalArgumentException(
        s"parameter $k must be positive, got $n")
      n
    }.getOrElse(d)
    def posLong(k: String, d: Long): Long = params.get(k).map { v =>
      val n = v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"parameter $k must be an integer, got '$v'"))
      if (n <= 0) throw new IllegalArgumentException(
        s"parameter $k must be positive, got $n")
      n
    }.getOrElse(d)
    Config(req("store.root"), req("table"),
      req("key.columns").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      params.getOrElse("batch.validation", "strict"), hadoopProps,
      autoMaintain = params.get("maintenance.auto").contains("true"),
      maintainMaxEntries = posInt("maintenance.max_entries", 8),
      maintainMaxBytes = posLong("maintenance.max_bytes",
        graft.tables.TableStore.SpjMaskMaxBytes / 2),
      maintainFiles = params.get("maintenance.files").contains("true"),
      maintainTargetBytes = posLong("maintenance.target_bytes",
        graft.tables.TableStore.DefaultTargetFileBytes),
      maintainMinInputFiles = {
        val n = posInt("maintenance.min_input_files", 5)
        // compactSmallFiles refuses < 2 — rejecting here keeps the
        // exact-cause-at-configure contract instead of silently failing
        // every ack's pack into lastFilePack
        if (n < 2) throw new IllegalArgumentException(
          "parameter maintenance.min_input_files must be >= 2 " +
            s"(packing one file merges nothing), got $n")
        n
      })
  }

  def open(spark: SparkSession, config: Config): DestinationStream = {
    val store = new TableStore(spark, config.storeRoot, config.hadoopProps)
    require(store.exists(config.table),
      s"table ${config.table} does not exist in ${config.storeRoot}")
    new DestinationStream(spark, store,
      CdcApply.CdcConfig(config.table, config.keyCols,
        strictValidation = config.validation == "strict"),
      maintenance = if (config.autoMaintain)
        Some((config.maintainMaxEntries, config.maintainMaxBytes)) else None,
      filePacking = if (config.maintainFiles)
        Some((config.maintainTargetBytes, config.maintainMinInputFiles))
      else None)
  }
}

/** Write acknowledgement: the durably-committed record's position. */
final case class Ack(position: Array[Byte])

/** An open ingest stream. Thread-unsafe single-writer, like the reference's
  * strictly-sequential record stream (SURVEY.md §3). */
final class DestinationStream private[api] (
    spark: SparkSession, store: TableStore, cfg: CdcApply.CdcConfig,
    maintenance: Option[(Int, Long)] = None,
    filePacking: Option[(Long, Int)] = None) {

  /** Last auto-maintenance outcome: (action, entries before, entries
    * after) or the failure. None until the first maintained write.
    * Maintenance runs AFTER the write commit, so its failure never
    * fails an ack (the data is already durable — failing the ack would
    * lie); a resident caller monitors THIS instead. */
  @volatile var lastMaintenance: Option[Try[(String, Int, Int)]] = None

  /** Last auto-pack outcome: (files rewritten, files written) or the
    * failure — same never-fails-an-ack contract as lastMaintenance. */
  @volatile var lastFilePack: Option[Try[(Int, Int)]] = None

  private def maintain(): Unit = {
    maintenance.foreach { case (e, b) =>
      lastMaintenance = Some(Try(store.maintainDeletes(cfg.table, e, b)))
    }
    // minInputFiles (default 5, Iceberg's min-input-files) gates the
    // per-ack pack: without it the accumulating packed file (< 3/4 of
    // target) is re-read and fully rewritten on EVERY subsequent ack
    // together with the new tiny file — O(n^2) write amplification over
    // a resident stream's life. With the gate, the resident file is
    // rewritten once per `minInputFiles - 1` new small files: amortized
    // O(n * target / minInputFiles) bytes, and most acks pack nothing
    // (a driver-side manifest check, no Spark job).
    filePacking.foreach { case (target, minIn) =>
      lastFilePack =
        Some(Try(store.compactSmallFiles(cfg.table, target, minIn)))
    }
  }

  /** Per-record write → ack, the reference's exact contract (one record,
    * one durable commit, one ack). Prefer `writeBatch` — the reference's
    * one-Spark-job-per-record shape is its own documented bottleneck. */
  def write(record: CdcRecord): Try[Ack] =
    Try { CdcApply(spark, store, cfg, Seq(record)); Ack(record.position) }
      .map { ack => maintain(); ack }

  /** Batched write: ONE distributed apply + ONE atomic snapshot commit for
    * the whole batch; acks preserve record order. All-or-nothing — on
    * failure no record in the batch is applied (stronger than the
    * reference's record-at-a-time partial progress). */
  def writeBatch(records: Seq[CdcRecord]): Try[Seq[Ack]] =
    Try {
      CdcApply(spark, store, cfg, records)
      records.map(r => Ack(r.position))
    }.map { acks => maintain(); acks }

  /** Current table contents (read-your-writes after an ack). */
  def table = store.read(cfg.table)
}
