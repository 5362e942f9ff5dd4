package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, BoundReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Murmur3HashFunction, StartsWith, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => VPredicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Storage-partitioned-join scan: a TRUE DSv2 batch scan over a
  * bucket-partitioned managed table that reports its layout as
  * [[KeyGroupedPartitioning]], so a join of two tables bucketed the same
  * way on the join key plans with ZERO shuffle on either side (Spark's
  * SPJ machinery, `spark.sql.sources.v2.bucketing.enabled`). At 100 TB
  * this is the single largest join optimization available to a table
  * format: the V1-bridged scan hides the layout behind an opaque RDD, so
  * every fact-fact join repartitions both sides — ~2× the table size in
  * shuffle I/O — where this scan proves co-partitioning and Spark zips
  * matching buckets directly.
  *
  * Eligibility is decided by [[TableStore.spjPlan]] (all-bucket spec, one
  * spec generation, no renames); every other table state falls back to
  * the V1 scan. Pending merge-on-read deletes do NOT fall back: the
  * sidecars ship as an [[TableStore.SpjDeleteMask]] and every read task
  * applies them in memory per file ([[GraftMaskedReaderFactory]]) —
  * masking drops rows WITHIN a bucket, so KeyGroupedPartitioning (and
  * the zero-exchange join) survives the CDC tombstones that a busy
  * merge-on-read table always carries. File pruning reuses the SAME
  * [[ZoneMapFileIndex]] the V1 relation plans through (zone stats, bloom
  * sidecars, bucket-dir arithmetic), so pushed filters skip files
  * identically on both paths.
  *
  * Exactness contract: the scan builder returns every translatable
  * filter to Spark as a residual (see [[GraftScanBuilder.pushFilters]]),
  * so pushed filters here are used for FILE PRUNING ONLY and row-level
  * filtering stays above the scan — parquet row-group stats still skip
  * inside surviving files via the pushed-down `filters` argument.
  *
  * Runtime filtering ([[SupportsRuntimeV2Filtering]]): join-key IN-sets
  * arriving after planning (DPP subqueries) prune whole bucket
  * directories by hash arithmetic before any reader starts — the V2
  * analogue of the hidden-bucket pruning in [[ZoneMapFileIndex]].
  */
private[tables] final class GraftBatchScan(store: TableStore, tbl: String,
    plan: TableStore.SpjPlan, pruning: Array[Filter], required: StructType)
  extends Scan with Batch with SupportsReportPartitioning
  with SupportsReportStatistics with SupportsRuntimeV2Filtering {

  private val spark: SparkSession = store.spark

  /** IDENTITY partition fields: their values live in directory names
    * only (classic hive — stripped from the data files), so the reader
    * attaches each directory's parsed value as the parquet
    * partition-values row. Hidden transforms keep their sources IN the
    * files and need nothing. */
  private val identityFields: Seq[PartitionField] =
    plan.fields.filter(_.isIdentity)
  private val identityIdx: Seq[Int] =
    plan.fields.zipWithIndex.collect { case (f, i) if f.isIdentity => i }
  private val identitySchema: StructType = StructType(identityFields.map { f =>
    val src = plan.bundle.physSch(plan.bundle.physSch.fieldIndex(f.source))
    StructField(f.source, src.dataType, nullable = true)
  })
  private val identityNames: Set[String] =
    identitySchema.fieldNames.toSet

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftBatchScan $tbl layout=[${plan.fields.map(_.render).mkString(", ")}] " +
      s"prunedBy=[${pruning.mkString(", ")}]" +
      plan.mask.map(m => s" morMask=[eq=${m.eq.size}, " +
        s"posFiles=${m.posFiles.size}, dvFiles=${m.dvFiles.size}]")
        .getOrElse("")

  // ---- partitioning ---------------------------------------------------------

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      plan.fields.map(f => GraftBatchScan.transformOf(f): Transform)
        .toArray[org.apache.spark.sql.connector.expressions.Expression],
      plannedPartitions.length)

  // ---- file planning --------------------------------------------------------

  /** Zone/bloom/bucket-pruned candidate files grouped by bucket tuple —
    * the same listFiles call the V1 relation's FileSourceScan makes, so
    * both paths skip identical file sets for identical predicates. */
  private lazy val prunedDirs
      : Seq[(InternalRow, Seq[(String, Long)])] = {
    val dataFilters = pruning.toSeq
      .flatMap(f => GraftBatchScan.pruningExpr(f, plan.bundle.dataSch))
    plan.bundle.idx.listFiles(Nil, dataFilters).map { pd =>
      (pd.values.copy(),
        pd.files.map(f => (f.getPath.toString, f.getLen)))
    }
  }

  /** Derived-value allow-sets from runtime (DPP) predicates, keyed by
    * spec position; None = no runtime restriction for that field. Values
    * are catalyst-internal in the field's DIRECTORY type. */
  @volatile private var runtimeAllowed
      : Seq[Option[Set[Any]]] = plan.fields.map(_ => None)

  // only sources that SURVIVED column pruning: DPP resolves these against
  // the scan's (pruned) output, so an unprojected partition source (e.g.
  // ts in a days(ts)+bucket(k) layout read for k alone) must not appear
  override def filterAttributes(): Array[NamedReference] =
    plan.fields.filter(f => required.fieldNames.contains(f.source))
      .map(f => Expressions.column(f.source): NamedReference).toArray

  override def filter(predicates: Array[VPredicate]): Unit = {
    val bySource = GraftBatchScan.runtimeValues(predicates)
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    runtimeAllowed = plan.fields.map { f =>
      bySource.get(f.source).flatMap { vs =>
        val srcType = plan.bundle.dataSch(
          plan.bundle.dataSch.fieldIndex(f.source)).dataType
        // every value must map through the transform, else fail open
        val ids = vs.map(v => GraftBatchScan.derivedOf(f, v, srcType, zone))
        if (ids.exists(_.isEmpty)) None else Some(ids.flatten.toSet)
      }
    }
  }

  private def plannedPartitions: Array[InputPartition] = {
    val allowed = runtimeAllowed
    val dirTypes = plan.bundle.dirTypes
    prunedDirs.flatMap { case (key, files) =>
      val keep = plan.fields.indices.forall { i =>
        allowed(i).forall(ids =>
          !key.isNullAt(i) && ids.contains(key.get(i, dirTypes(i))))
      }
      if (!keep) Nil
      else {
        // identity layouts: this directory's parsed values ride as the
        // parquet partition-values row, appended to every row the
        // closure reads (dir type == source type for identity)
        val partVals =
          if (identityIdx.isEmpty) InternalRow.empty
          else InternalRow.fromSeq(identityIdx.map(i =>
            if (key.isNullAt(i)) null
            else key.get(i, plan.bundle.dirTypes(i))))
        // SPLIT partitions WITHIN each key group (each carrying the
        // group's values via HasPartitionKey): Spark's BatchScanExec
        // re-groups splits per key for the normal storage-partitioned
        // join, and — when `v2.bucketing.partiallyClusteredDistribution`
        // is on — KEEPS a skewed side's splits ungrouped and replicates
        // the other side's groups across them, so one hot bucket becomes
        // several tasks instead of serializing the zero-exchange join.
        // Splits are BIN-PACKED to maxPartitionBytes (not one per file):
        // a small-files-heavy group stays a few tasks while a hot
        // bucket's volume still fans out. Masked tables split the same
        // way — the per-executor [[SpjMaskCache]] shares one sidecar
        // build across a group's splits, so fine splits no longer
        // multiply the MoR re-read trade.
        val keyArr = key.toSeq(plan.bundle.pSchema).toArray
        def pf(path: String, len: Long) =
          PartitionedFile(partVals,
            org.apache.spark.paths.SparkPath.fromPathString(path),
            0L, len, Array.empty, 0L, len, Map.empty)
        // rel path under data/ — the key the delete mask's fileSeqs
        // and position sidecars use (same split the V1 masked read
        // applies to _metadata.file_path)
        def rel(path: String) = path.split("/data/").last
        val cap = math.max(1L,
          spark.sessionState.conf.filesMaxPartitionBytes)
        val bins = Seq.newBuilder[Seq[(String, Long)]]
        var cur = List.empty[(String, Long)]
        var curBytes = 0L
        files.foreach { f =>
          if (cur.nonEmpty && curBytes + f._2 > cap) {
            bins += cur.reverse; cur = Nil; curBytes = 0L
          }
          cur = f :: cur; curBytes += f._2
        }
        if (cur.nonEmpty) bins += cur.reverse
        bins.result().map { bin =>
          GraftInputPartition(keyArr,
            bin.map { case (p, l) => pf(p, l) }.toArray,
            bin.map(f => rel(f._1)).toArray): InputPartition
        }
      }
    }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = plannedPartitions

  // ---- reading --------------------------------------------------------------

  /** Driver-built serializable parquet read closure (hadoopConf travels
    * as its own broadcast — ParquetFileFormat is designed for exactly
    * this shipping). Filters go to parquet for row-group/page skipping —
    * exact evaluation stays with Spark's residual filter. Missing
    * columns (post-evolution files) read back null; INT32/FLOAT pages
    * upcast natively under a widened required schema. The vectorized
    * reader stays ON but returns ROWS (returning_batch=false) — the DSv2
    * row-based PartitionReader contract. */
  private def buildRead(dataSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter],
      partitionSchema: StructType = new StructType())
      : PartitionedFile => Iterator[InternalRow] =
    new ParquetFileFormat().buildReaderWithPartitionValues(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      dataSchema = dataSchema,
      partitionSchema = partitionSchema,
      requiredSchema = requiredSchema,
      filters = filters,
      options = Map(
        org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> "false"),
      hadoopConf = spark.sessionState.newHadoopConf())

  override def createReaderFactory(): PartitionReaderFactory = {
    val dataSch = plan.bundle.dataSch
    // identity columns come from the partition-values row, never the
    // file: read only the DATA part of `required`, let the closure
    // append the identity values, and project back to `required`'s
    // order afterwards. Filters over identity columns never reach
    // parquet (the file has no such column) — they already pruned
    // directories in listFiles, and Spark's residual applies exactly.
    val dataRequired =
      StructType(required.fields.filterNot(f => identityNames(f.name)))
    val dataFilters = pruning.toSeq
      .filter(_.references.forall(r => !identityNames(r)))
    plan.mask match {
      case None =>
        val combined = StructType(dataRequired.fields ++ identitySchema.fields)
        new GraftReaderFactory(
          buildRead(dataSch, dataRequired, dataFilters, identitySchema),
          if (combined == required) None else Some((combined, required)))
      case Some(m) =>
        // pending MoR deletes: widen the read so masking has what it
        // needs — equality-delete key columns the projection pruned
        // away, and the parquet reader's TRUE row ordinal (populated
        // from page-store row ranges, so row-group/page skipping never
        // desynchronizes it) when position sidecars are pending. The
        // extra columns are dropped after masking. Identity-sourced key
        // columns arrive via the appended partition values like any
        // other identity column.
        val eqCols = m.eq.flatMap(_.cols).distinct
        val missing = eqCols.filterNot(c =>
          dataRequired.fieldNames.contains(c) || identityNames(c))
        val needPos = m.posFiles.nonEmpty || m.dvFiles.nonEmpty
        var widenedData = missing.foldLeft(dataRequired)((s, c) =>
          s.add(dataSch(dataSch.fieldIndex(c))))
        // the reader-recognized temp name; MUST be nullable so the
        // parquet reader classifies it "missing in file" and hands it
        // to the RowIndexGenerator instead of erroring
        if (needPos)
          widenedData = widenedData.add(StructField(
            ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
            LongType, nullable = true))
        // the reader's true output layout: widened data ++ identity
        val combined =
          StructType(widenedData.fields ++ identitySchema.fields)
        val sch = StructType(dataSch.fields ++ identitySchema.fields)
        val keySchemas: Map[Seq[String], StructType] =
          m.eq.map(_.cols).distinct.map { cs =>
            cs -> StructType(cs.map(c =>
              sch(sch.fieldIndex(c)).copy(nullable = true)))
          }.toMap
        val delFuncs = keySchemas.map { case (cs, ks) =>
          cs -> buildRead(ks, ks, Nil)
        }
        val posSchema = StructType(Seq(
          StructField(TableStore.PosFileCol, StringType, nullable = true),
          StructField(TableStore.PosIdxCol, LongType, nullable = true)))
        val posFunc =
          if (m.posFiles.nonEmpty)
            Some(buildRead(posSchema, posSchema, Nil)) else None
        val dvSchema = StructType(
          DeletionVectors.dvSchema.fields.map(_.copy(nullable = true)))
        val dvFunc =
          if (m.dvFiles.nonEmpty)
            Some(buildRead(dvSchema, dvSchema, Nil)) else None
        new GraftMaskedReaderFactory(
          buildRead(dataSch, widenedData, dataFilters, identitySchema),
          combined, required, m, delFuncs, keySchemas, posFunc, dvFunc,
          plan.fields,
          spark.sessionState.conf.sessionLocalTimeZone)
    }
  }

  // ---- statistics -----------------------------------------------------------

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(
        prunedDirs.iterator.flatMap(_._2).map(_._2).sum)
    // This scan prunes FILES only and returns every filter as residual
    // (see the class doc), so the Filter node above applies selectivity
    // to these full-table numbers exactly once; reporting them under
    // pushed pruning filters stays the upper bound of the scan output.
    override def numRows(): java.util.OptionalLong =
      store.rowCount(tbl).map(java.util.OptionalLong.of)
        .getOrElse(java.util.OptionalLong.empty())
    override def columnStats()
        : java.util.Map[NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
      ColumnStatsReport.build(store, tbl, required)
  }
}

private[tables] object GraftBatchScan {

  /** sources.Filter → Catalyst expression in the EXACT shapes
    * [[ZoneStats]] extracts bounds/probes from (AttributeReference vs
    * Literal conjuncts). Top-level columns only; None = untranslatable
    * = contributes no pruning (fail open — Spark still evaluates the
    * residual exactly). */
  private[tables] def pruningExpr(f: Filter, sch: StructType)
      : Option[Expression] = {
    def attr(n: String): Option[AttributeReference] =
      sch.fields.find(_.name == n).map(fd =>
        AttributeReference(fd.name, fd.dataType, fd.nullable)())
    def lit(n: String, v: Any): Option[Literal] =
      sch.fields.find(_.name == n).map(fd => Literal.create(v, fd.dataType))
    f match {
      case sources.EqualTo(a, v) =>
        for (x <- attr(a); l <- lit(a, v)) yield EqualTo(x, l)
      case sources.EqualNullSafe(a, v) =>
        for (x <- attr(a); l <- lit(a, v)) yield EqualNullSafe(x, l)
      case sources.GreaterThan(a, v) =>
        for (x <- attr(a); l <- lit(a, v)) yield GreaterThan(x, l)
      case sources.GreaterThanOrEqual(a, v) =>
        for (x <- attr(a); l <- lit(a, v)) yield GreaterThanOrEqual(x, l)
      case sources.LessThan(a, v) =>
        for (x <- attr(a); l <- lit(a, v)) yield LessThan(x, l)
      case sources.LessThanOrEqual(a, v) =>
        for (x <- attr(a); l <- lit(a, v)) yield LessThanOrEqual(x, l)
      case sources.In(a, vs) =>
        for {
          x <- attr(a)
          ls <- Some(vs.toSeq.map(v => lit(a, v)))
          if ls.forall(_.isDefined)
        } yield In(x, ls.flatten)
      case sources.StringStartsWith(a, v) =>
        for (x <- attr(a); l <- lit(a, v)) yield StartsWith(x, l)
      case sources.And(l, r) =>
        for (lc <- pruningExpr(l, sch); rc <- pruningExpr(r, sch))
          yield CAnd(lc, rc)
      case _ => None
    }
  }

  /** Equality/IN value sets per column from runtime V2 predicates (the
    * shapes DPP emits). Values arrive as Catalyst-internal literals. */
  private[tables] def runtimeValues(predicates: Array[VPredicate])
      : Map[String, Seq[Any]] = {
    val b = scala.collection.mutable.Map.empty[String, Seq[Any]]
    predicates.foreach { p =>
      val children = p.children()
      p.name() match {
        case "IN" if children.nonEmpty =>
          (children.head, children.tail) match {
            case (r: NamedReference, vs)
                if r.fieldNames.length == 1 &&
                  vs.forall(_.isInstanceOf[org.apache.spark.sql.connector.expressions.Literal[_]]) =>
              b += r.fieldNames.head ->
                vs.map(_.asInstanceOf[org.apache.spark.sql.connector.expressions.Literal[_]].value: Any).toSeq
            case _ => ()
          }
        case "=" if children.length == 2 =>
          (children(0), children(1)) match {
            case (r: NamedReference, v: org.apache.spark.sql.connector.expressions.Literal[_])
                if r.fieldNames.length == 1 =>
              b += r.fieldNames.head -> Seq(v.value: Any)
            case _ => ()
          }
        case _ => () // unsupported runtime shape: no extra pruning
      }
    }
    b.toMap
  }

  /** The field's layout as the V2 transform Spark compares across join
    * sides (and resolves through the catalog's [[GraftFunctions]]). */
  private[tables] def transformOf(f: PartitionField): Transform = f match {
    case b: PartitionField.PBucket  => Expressions.bucket(b.n, b.source)
    case d: PartitionField.PDays    => Expressions.days(d.source)
    case h: PartitionField.PHours   => Expressions.hours(h.source)
    case m: PartitionField.PMonths  => Expressions.months(m.source)
    case y: PartitionField.PYears   => Expressions.years(y.source)
    // width folded into the NAME: Spark's SPJ machinery
    // (KeyGroupedPartitioning.supportsExpressions) accepts only
    // SINGLE-child transforms — bucket's literal is special-cased out by
    // the resolver, a (width, col) truncate is not — so each width is
    // its own catalog-served function
    case t: PartitionField.PTruncate =>
      Expressions.apply(s"truncate${t.w}", Expressions.column(t.source))
    case i: PartitionField.PIdentity => Expressions.identity(i.source)
  }

  /** Derived directory value of a Catalyst-internal source value — the
    * runtime (DPP) analogue of the write-side layout expression: builds
    * [[PartitionField.catalystExpr]] over a literal and evaluates it, so
    * every transform maps probes EXACTLY as the writer mapped rows.
    * None = value/type outside the transform's domain (fail open). */
  private[tables] def derivedOf(f: PartitionField, v: Any, srcType: DataType,
      sessionZone: String): Option[Any] = {
    val typeOk = (v, srcType) match {
      case (null, _) => true
      case (_: Integer, IntegerType) => true
      case (_: java.lang.Long, LongType) => true
      case (_: org.apache.spark.unsafe.types.UTF8String, StringType) => true
      case (_: java.lang.Long, t) if t == org.apache.spark.sql.types.TimestampType ||
        t == org.apache.spark.sql.types.TimestampNTZType => true
      case (_: Integer, org.apache.spark.sql.types.DateType) => true
      case _ => false
    }
    if (!typeOk) None
    else
      try Some(PartitionField.catalystExpr(f, Literal(v, srcType), srcType,
        sessionZone).eval(null))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Bucket id of a Catalyst-internal value — MUST mirror the write-side
    * layout expression `Pmod(Murmur3Hash(src), n)` exactly
    * ([[PartitionField.catalystExpr]]). Null hashes to the bare seed,
    * same as Murmur3Hash over a null child. */
  private[tables] def bucketId(n: Int, v: Any, srcType: DataType)
      : Option[Int] = {
    val ok = (v, srcType) match {
      case (null, _) => true
      case (_: Integer, IntegerType) => true
      case (_: java.lang.Long, LongType) => true
      case (_: org.apache.spark.unsafe.types.UTF8String, StringType) => true
      case _ => false
    }
    if (!ok) None
    else {
      val h =
        if (v == null) 42
        else Murmur3HashFunction.hash(v, srcType, 42L).toInt
      Some(((h % n) + n) % n)
    }
  }
}

/** One bucket-tuple's worth of files. `keyVals` are the directory's
  * parsed bucket ids (plain Ints — serializable by construction) in spec
  * order, matching the reported KeyGroupedPartitioning keys. `rels` are
  * the files' rel paths under `data/` (parallel to `files`) — the keys
  * the pending-delete mask is scoped by. */
private[tables] final case class GraftInputPartition(keyVals: Array[Any],
    files: Array[PartitionedFile], rels: Array[String])
  extends InputPartition
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow.fromSeq(keyVals.toSeq)
  override def preferredLocations(): Array[String] = Array.empty
}

/** Executes the driver-built parquet read closure per file. Vectorized
  * reads hand back ColumnarBatch disguised as InternalRow — flattened
  * here row-by-row (the same contract FileSourceScan's consumers
  * handle); reader close is registered by the closure itself on the
  * task-completion listener. `reorder` (combined layout, output layout)
  * reprojects when the closure's output order differs from the scan's
  * readSchema — the identity-layout case, where partition values append
  * at the END of each row. */
private[tables] final class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    reorder: Option[(StructType, StructType)] = None)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files = p.asInstanceOf[GraftInputPartition].files.iterator
    val proj: InternalRow => InternalRow = reorder match {
      case None => identity
      case Some((combined, output)) =>
        val up = UnsafeProjection.create(
          output.fieldNames.toIndexedSeq.map { c =>
            val i = combined.fieldIndex(c)
            BoundReference(i, combined(i).dataType,
              combined(i).nullable): Expression
          })
        up(_)
    }
    new PartitionReader[InternalRow] {
      private var cur: Iterator[Object] = Iterator.empty
      private var row: InternalRow = _
      override def next(): Boolean = {
        while (true) {
          if (cur.hasNext) {
            cur.next() match {
              case b: ColumnarBatch =>
                val rows = b.rowIterator().asScala
                cur = rows.asInstanceOf[Iterator[Object]] ++ cur
              case r: InternalRow =>
                row = proj(r)
                return true
            }
          } else if (files.hasNext) {
            cur = readFunc(files.next()).asInstanceOf[Iterator[Object]]
          } else return false
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** SPJ reader with pending merge-on-read deletes applied per file —
  * the Iceberg MoR read shape: each task re-reads the (small, byte-
  * capped at plan time) applicable delete sidecars, builds in-memory
  * masks once, and drops masked rows while streaming its data files.
  * Equality entries mask a file only when their commit sequence is
  * ABOVE the file's recorded sequence (the rule that lets a later
  * append re-insert a deleted key); delete keys containing any null
  * mask nothing (equality semantics — and an all-set UnsafeRow probe
  * can never bytewise-equal a set member with a null bit, so null data
  * keys are safe by construction). Position entries mask by (rel path,
  * true parquet row ordinal). Masking never moves a row between
  * buckets, so the scan's reported KeyGroupedPartitioning stays exact.
  *
  * Mirrors [[TableStore.morMasked]]'s semantics (sequence classes,
  * union-of-entries per key set, file-scoped position masks) without
  * its DataFrame anti-joins — which would sit between scan and join
  * and forfeit the zero-exchange plan this scan exists to keep. */
private[tables] final class GraftMaskedReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    widened: StructType, output: StructType,
    mask: TableStore.SpjDeleteMask,
    delFuncs: Map[Seq[String], PartitionedFile => Iterator[InternalRow]],
    keySchemas: Map[Seq[String], StructType],
    posFunc: Option[PartitionedFile => Iterator[InternalRow]],
    dvFunc: Option[PartitionedFile => Iterator[InternalRow]],
    specFields: Seq[PartitionField],
    sessionZone: String)
  extends PartitionReaderFactory {

  private def pfOf(path: String, len: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(path),
      0L, len, Array.empty, 0L, len, Map.empty)

  /** Vectorized readers hand back ColumnarBatch disguised as
    * InternalRow — flatten to true rows (same contract as
    * [[GraftReaderFactory]]). */
  private def flatRows(f: PartitionedFile => Iterator[InternalRow],
      file: PartitionedFile): Iterator[InternalRow] =
    f(file).asInstanceOf[Iterator[Object]].flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }

  /** Key-group scoping of equality-delete keys: a row in this task has
    * derived(field) == the task's partition value for EVERY layout
    * field, and an equality key masks a row only when it EQUALS it on
    * the key columns — so a key whose derived value differs from the
    * task's can mask nothing here and is dropped at set-build time.
    * One predicate per layout field whose source is a key column
    * (bucket is the headline — per-task retained keys shrink ∝ 1/n —
    * but the same argument holds for identity/days/truncate layouts).
    * A null task value or a non-evaluating derivation keeps the key
    * (fail open: extra keys cost memory, never correctness). Zone-
    * DEPENDENT derivations (days/months/years over a zoned timestamp)
    * are skipped entirely: a read-session zone differing from the
    * write-time zone yields a real, non-null, MISMATCHED value — which
    * the null/exception guards don't catch — and dropping an applicable
    * tombstone on it would resurrect deleted rows. */
  /** Stat-domain range value → the Catalyst internal value the layout
    * expression evaluates over. None = unrepresentable (fail open —
    * the sidecar file is read, never skipped). */
  private def statToInternal(v: Any, dt: org.apache.spark.sql.types.DataType)
      : Option[Any] = {
    import org.apache.spark.sql.types._
    (v, dt) match {
      case (s: String, StringType) =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case (l: Long, LongType) => Some(l)
      case (l: Long, IntegerType) if l.isValidInt => Some(l.toInt)
      case (l: Long, ShortType) if l.isValidShort => Some(l.toShort)
      case (l: Long, ByteType) if l.isValidByte => Some(l.toByte)
      case (l: Long, TimestampType | TimestampNTZType) => Some(l)
      case (l: Long, DateType) if l.isValidInt => Some(l.toInt)
      case (d: Double, DoubleType) => Some(d)
      case (d: Double, FloatType) => Some(d.toFloat)
      case _ => None
    }
  }

  /** Normalize derived values to [[ZoneStats.cmp]]'s domain. */
  private def cmpNorm(a: Any, b: Any): Option[Int] = {
    def n(v: Any): Any = v match {
      case i: Int => i.toLong
      case s: Short => s.toLong
      case y: Byte => y.toLong
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case f: Float => f.toDouble
      case other => other
    }
    ZoneStats.cmp(n(a), n(b))
  }

  /** Per-dimension skip tests for whole sidecar files: a sidecar file
    * whose recorded range on a layout dimension excludes the task's
    * partition value can mask nothing in this task and is skipped
    * WITHOUT being read. This is what layout-clustered sidecars buy:
    * each key-group task reads only its slice of the tombstone pile,
    * so per-task sidecar I/O and retained bytes stay bounded however
    * large the total pile grows.
    *
    * Two tests per layout field over a key column: (a) the DIRECT test
    * against the recorded derived-value range under the field's
    * dirName — valid for EVERY transform including bucket, because the
    * writer recorded the derived values themselves (identity records
    * under the source name, which IS its dirName); (b) a monotonic
    * fallback deriving bounds from the RAW key range under the source
    * name — covers sidecars written before a spec change re-derived
    * the layout (bucket excluded: hash order has no relation to key
    * order). The same zone-dependence exclusion as [[keyGroupScopes]]
    * applies, and every conversion/evaluation failure keeps the file
    * (fail open). */
  private def fileSkipTests(taskKey: Array[Any], cols: Seq[String],
      ks: StructType): Seq[(String, (Any, Any) => Boolean)] =
    specFields.zipWithIndex.flatMap { case (f, i) =>
      val ci = cols.indexOf(f.source)
      if (ci < 0 || i >= taskKey.length || taskKey(i) == null) Nil
      else if (PartitionField.zoneDependent(f, ks(ci).dataType)) Nil
      else {
        val dt = ks(ci).dataType
        val expect = taskKey(i)
        val direct: (Any, Any) => Boolean = (mn, mx) =>
          (cmpNorm(expect, mn), cmpNorm(expect, mx)) match {
            case (Some(x), Some(y)) => x < 0 || y > 0
            case _ => false
          }
        val mono: Option[(String, (Any, Any) => Boolean)] =
          if (f.isInstanceOf[PartitionField.PBucket] || f.isIdentity) None
          else {
            val expr = PartitionField.catalystExpr(f,
              BoundReference(0, dt, nullable = true), dt, sessionZone)
            def derive(v: Any): Any =
              try expr.eval(InternalRow(v))
              catch { case _: Exception => null }
            Some((f.source, (mn: Any, mx: Any) =>
              (statToInternal(mn, dt), statToInternal(mx, dt)) match {
                case (Some(a), Some(b)) =>
                  val (da, db) = (derive(a), derive(b))
                  // monotonic derivation: keys in [mn,mx] derive inside
                  // [da,db]; a task value strictly outside matches none
                  da != null && db != null && direct(da, db)
                case _ => false
              }))
          }
        // the direct test keys by the field's RENDER (parameter-
        // qualified — `bucket(16:k)`; identity's render IS the raw
        // column name, whose recorded range IS its derived range): a
        // sidecar written under a DIFFERENT spec generation's
        // parameters simply misses the lookup and fails open, instead
        // of comparing values from the wrong derivation domain
        Seq((f.render, direct)) ++ mono
      }
    }

  /** A task whose partition value is NULL for a non-bucket layout field
    * sourced on one of the entry's key columns holds ONLY rows whose
    * key column is null there (identity/time/truncate derive null iff
    * the source is null; bucket hashes null to a real id, so it never
    * yields a null task value): equality keys are non-null on every
    * column by construction (null-component keys are dropped at set
    * build), so NO key of this entry can match any row of this task —
    * the whole entry is skipped without reading a byte. Also what
    * keeps the per-task mask BUDGET sound: without this, the null
    * group would fail open on every range test and retain the entire
    * pile the planner budgeted per-slice. */
  private def nullGroupInapplicable(taskKey: Array[Any],
      cols: Seq[String]): Boolean =
    specFields.zipWithIndex.exists { case (f, i) =>
      i < taskKey.length && taskKey(i) == null &&
        !f.isInstanceOf[PartitionField.PBucket] && cols.contains(f.source)
    }

  private def keyGroupScopes(taskKey: Array[Any], cols: Seq[String],
      ks: StructType): Seq[InternalRow => Boolean] =
    specFields.zipWithIndex.flatMap { case (f, i) =>
      val ci = cols.indexOf(f.source)
      if (ci < 0 || i >= taskKey.length || taskKey(i) == null) None
      else if (PartitionField.zoneDependent(f, ks(ci).dataType)) None
      else {
        val dt = ks(ci).dataType
        val expr = PartitionField.catalystExpr(f,
          BoundReference(ci, dt, nullable = true), dt, sessionZone)
        val expect = taskKey(i)
        Some((r: InternalRow) => {
          val v = try expr.eval(r) catch { case _: Exception => null }
          v == null || v == expect
        })
      }
    }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftInputPartition]
    // mask state CACHED per executor ([[SpjMaskCache]]) — equality sets
    // per KEY GROUP (scoped: a task's group retains only tombstones
    // whose derived partition value matches, so retained keys divide by
    // the layout width), position bitmaps once per mask (compressed —
    // the whole table's tombstones fit in roaring-bitmap bytes). Splits
    // of the same group share one sidecar build.
    val eqSets: Seq[(Seq[String], Int, java.util.HashSet[UnsafeRow],
        org.apache.spark.util.sketch.BloomFilter)] =
      SpjMaskCache.getOrBuild(("eq", mask, part.keyVals.toSeq)) {
        var bytesRead = 0L
        val built = mask.eq.map { e =>
          val ks = keySchemas(e.cols)
          val proj = UnsafeProjection.create(ks)
          val scopes = keyGroupScopes(part.keyVals, e.cols, ks)
          // whole-file skip from the sorted sidecar's per-file ranges:
          // read only the files whose key slice can touch this task
          val tests = fileSkipTests(part.keyVals, e.cols, ks)
          def skip(path: String): Boolean = tests.nonEmpty && {
            val fn = path.substring(path.lastIndexOf('/') + 1)
            e.ranges.get(fn).exists(cr => tests.exists { case (c, t) =>
              cr.get(c).exists { case (mn, mx) => t(mn, mx) }
            })
          }
          val set = new java.util.HashSet[UnsafeRow]()
          if (!nullGroupInapplicable(part.keyVals, e.cols))
            e.files.foreach { case (path, len) =>
              if (!skip(path)) {
                bytesRead += len
                flatRows(delFuncs(e.cols), pfOf(path, len)).foreach { r =>
                  if (!(0 until ks.length).exists(r.isNullAt) &&
                      scopes.forall(_(r))) {
                    set.add(proj(r).copy()); ()
                  }
                }
              }
            }
          // bloom prescreen for the probe loop: data rows are mostly
          // NOT deleted, and a bit-array miss is cheaper than a
          // HashSet walk — ~1.2 bytes/key at 1% fpp, false positives
          // just fall through to the exact set
          val bloom = org.apache.spark.util.sketch.BloomFilter
            .create(math.max(set.size().toLong, 64L), 0.01)
          set.forEach(k => bloom.putLong(k.hashCode().toLong))
          (e.cols, e.seq, set, bloom)
        }
        if (SpjMaskStats.enabled.get())
          SpjMaskStats.record(built.map(_._3.size.toLong).sum, 0L,
            eqBytes = bytesRead)
        built
      } { built =>
        // estimated pinned bytes: UnsafeRow payload + ~48B HashSet entry
        // overhead per retained key, + the bloom's bit array
        built.iterator.map { case (_, _, set, bloom) =>
          var b = 64L + bloom.bitSize() / 8
          val it = set.iterator()
          while (it.hasNext) b += it.next().getSizeInBytes + 48L
          b
        }.sum
      }
    // positional masks normalize to ONE roaring bitmap per data file:
    // legacy pair sidecars add ordinals, deletion-vector sidecars OR
    // deserialized bitmaps — memory is the COMPRESSED bitmap size, not
    // an entry per tombstone (what lets the SpjMaskMaxBytes budget
    // survive orders of magnitude more tombstones than the old
    // HashSet[Long]-per-file representation); built ONCE per mask per
    // executor, readers probe only their own files' entries
    val posSets: Map[String, org.roaringbitmap.longlong.Roaring64Bitmap] =
      SpjMaskCache.getOrBuild(("pos", mask)) {
        val m = scala.collection.mutable.Map
          .empty[String, org.roaringbitmap.longlong.Roaring64Bitmap]
        posFunc.foreach { f =>
          mask.posFiles.foreach { case (path, len) =>
            flatRows(f, pfOf(path, len)).foreach { r =>
              if (!r.isNullAt(0) && !r.isNullAt(1)) {
                m.getOrElseUpdate(r.getUTF8String(0).toString,
                  new org.roaringbitmap.longlong.Roaring64Bitmap())
                  .addLong(r.getLong(1)); ()
              }
            }
          }
        }
        dvFunc.foreach { f =>
          mask.dvFiles.foreach { case (path, len) =>
            flatRows(f, pfOf(path, len)).foreach { r =>
              if (!r.isNullAt(0) && !r.isNullAt(1)) {
                val bm = DeletionVectors.deserialize(r.getBinary(1))
                m.get(r.getUTF8String(0).toString) match {
                  case Some(acc) => acc.or(bm)
                  case None =>
                    m.update(r.getUTF8String(0).toString, bm)
                }
              }
            }
          }
        }
        val built = m.toMap
        if (SpjMaskStats.enabled.get())
          SpjMaskStats.record(0L,
            built.valuesIterator.map(_.getLongCardinality).sum)
        built
      } { built =>
        // roaring bitmaps: in-memory ≈ serialized form (+ map overhead)
        built.iterator.map { case (f, bm) =>
          bm.serializedSizeInBytes() + f.length * 2L + 96L
        }.sum
      }
    val posOrd =
      if (posFunc.isDefined || dvFunc.isDefined)
        widened.fieldIndex(ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)
      else -1
    val keyProjs: Map[Seq[String], UnsafeProjection] =
      mask.eq.map(_.cols).distinct.map { cols =>
        cols -> UnsafeProjection.create(cols.map { c =>
          val i = widened.fieldIndex(c)
          BoundReference(i, widened(i).dataType, nullable = true): Expression
        })
      }.toMap
    val outProj: InternalRow => InternalRow =
      if (widened == output) identity
      else {
        val proj = UnsafeProjection.create(
          output.fieldNames.toIndexedSeq.map { c =>
            val i = widened.fieldIndex(c)
            BoundReference(i, widened(i).dataType,
              widened(i).nullable): Expression
          })
        proj(_)
      }

    new PartitionReader[InternalRow] {
      private var fi = -1
      private var cur: Iterator[InternalRow] = Iterator.empty
      private var applicable: Seq[(UnsafeProjection,
          java.util.HashSet[UnsafeRow],
          org.apache.spark.util.sketch.BloomFilter)] = Nil
      private var posSet: org.roaringbitmap.longlong.Roaring64Bitmap = null
      private var row: InternalRow = _
      private def advanceFile(): Boolean = {
        fi += 1
        if (fi >= part.files.length) return false
        val fseq = mask.fileSeqs.getOrElse(part.rels(fi), 0)
        applicable = eqSets.collect {
          case (cols, seq, set, bloom) if seq > fseq && !set.isEmpty =>
            (keyProjs(cols), set, bloom)
        }
        posSet = posSets.getOrElse(part.rels(fi), null)
        cur = flatRows(readFunc, part.files(fi))
        true
      }
      override def next(): Boolean = {
        while (true) {
          if (cur.hasNext) {
            val r = cur.next()
            val masked =
              (posSet != null && posSet.contains(r.getLong(posOrd))) ||
                applicable.exists { case (proj, set, bloom) =>
                  val k = proj(r)
                  bloom.mightContainLong(k.hashCode().toLong) &&
                    set.contains(k)
                }
            if (!masked) { row = outProj(r); return true }
          } else if (!advanceFile()) return false
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** Per-executor cache of built SPJ delete masks, keyed by mask content
  * (sidecar paths + sequences — distinct per table snapshot) plus the
  * key group for equality sets. Splits of the same key group share one
  * sidecar build instead of re-reading per task, which is what lets
  * masked tables keep FINE-GRAINED splits (bin-packed, partial-
  * clustering-capable) without multiplying the Iceberg MoR re-read
  * trade by the split count. Bounded by ESTIMATED BYTES (one entry can
  * expand up to `SpjMaskMaxBytes` of sidecar into in-memory sets, so an
  * entry-count bound alone could pin multiple GB per executor). On a
  * real cluster each executor builds a group's mask at most once;
  * local[n] shares one. */
private[tables] object SpjMaskCache {
  private val cache =
    new BoundedLoadingCache(TableStore.SpjMaskCacheMaxBytes, 32)
  def getOrBuild[T <: AnyRef](key: AnyRef)(build: => T)(
      sizeOf: T => Long): T = cache.getOrBuild(key)(build)(sizeOf)
  /** Test hook: clear between measurements. */
  private[tables] def reset(): Unit = cache.reset()
  private[tables] def accountedBytes: Long = cache.accountedBytes
  private[tables] def size: Int = cache.size
}

/** Test-visible per-task mask-size telemetry for the SPJ masked read
  * (local mode only — executors share the driver JVM; on a real cluster
  * this is a per-executor no-op unless enabled there, and nothing in
  * the read path depends on it). `sumEq`/`sumPos` across tasks pin that
  * key-group scoping retains each tombstone in ~one task instead of
  * every task; `maxTaskEq` pins the per-task ceiling. */
private[tables] object SpjMaskStats {
  val enabled = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val sumEq = new java.util.concurrent.atomic.AtomicLong(0)
  private val sumPos = new java.util.concurrent.atomic.AtomicLong(0)
  private val maxEq = new java.util.concurrent.atomic.AtomicLong(0)
  private val taskN = new java.util.concurrent.atomic.AtomicLong(0)
  private val sumEqB = new java.util.concurrent.atomic.AtomicLong(0)
  private val maxEqB = new java.util.concurrent.atomic.AtomicLong(0)
  def reset(): Unit = {
    sumEq.set(0); sumPos.set(0); maxEq.set(0); taskN.set(0)
    sumEqB.set(0); maxEqB.set(0)
  }
  def record(eq: Long, pos: Long, eqBytes: Long = 0L): Unit = {
    sumEq.addAndGet(eq); sumPos.addAndGet(pos)
    maxEq.updateAndGet(m => math.max(m, eq)); taskN.incrementAndGet()
    sumEqB.addAndGet(eqBytes)
    maxEqB.updateAndGet(m => math.max(m, eqBytes))
    ()
  }
  def snapshot(): (Long, Long, Long, Long) =
    (sumEq.get(), sumPos.get(), maxEq.get(), taskN.get())
  /** (total sidecar bytes read across eq builds, max per one build) —
    * pins that range-based file skipping shrinks per-task sidecar I/O
    * with key-sorted sidecars. */
  def eqBytesRead(): (Long, Long) = (sumEqB.get(), maxEqB.get())
}

/** The catalog-served V2 functions backing hidden-partitioning
  * transforms: what lets Spark resolve a reported
  * `bucket(n, col)` KeyGroupedPartitioning to a [[ScalarFunction]] it
  * can compare across join sides (and evaluate, when shuffling a
  * non-partitioned side to match — `v2.bucketing.shuffle.enabled`). */
private[tables] object GraftFunctions {

  val names: Seq[String] =
    Seq("bucket", "days", "hours", "months", "years")

  private val TruncateN = """^truncate(\d+)$""".r

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(BucketUnbound)
    case "days" | "hours" | "months" | "years" => Some(new TimeUnbound(name))
    case TruncateN(w) if w.toInt > 0 => Some(new TruncateUnbound(w.toInt))
    case _ => None
  }

  /** days/hours/months/years over a timestamp (days also over a date):
    * the temporal hidden-partitioning transforms as V2 functions, so two
    * tables laid out `days(ts)` report comparable partitionings. Zoned
    * timestamps derive in the SESSION zone (captured at bind — the same
    * zone the writer bucketed in) and embed it in the canonical name:
    * sessions in different zones must never consider the layouts equal.
    * NTZ/date derive zone-free. */
  private final class TimeUnbound(fname: String) extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(col): temporal hidden-partitioning transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1,
        s"$fname expects (col), got ${inputType.simpleString}")
      val srcType = inputType(0).dataType
      val field: PartitionField = fname match {
        case "days"   => PartitionField.PDays("c")
        case "hours"  => PartitionField.PHours("c")
        case "months" => PartitionField.PMonths("c")
        case _        => PartitionField.PYears("c")
      }
      PartitionField.validate(field, srcType) // throws on a bad source type
      new DerivedBound(fname, field, srcType,
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    }
  }

  private final class TruncateUnbound(w: Int) extends UnboundFunction {
    override def name(): String = s"truncate$w"
    override def description(): String =
      s"truncate$w(col): width-$w hidden-partitioning transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1,
        s"truncate$w expects (col), got ${inputType.simpleString}")
      val srcType = inputType(0).dataType
      PartitionField.validate(PartitionField.PTruncate(w, "c"), srcType)
      new TruncateBound(w, srcType,
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    }
  }

  /** Evaluates the EXACT write-side derivation
    * ([[PartitionField.catalystExpr]]) over each input value. */
  private final class DerivedBound(fname: String, field: PartitionField,
      srcType: DataType, zone: String) extends ScalarFunction[AnyRef] {
    override def inputTypes(): Array[DataType] = Array(srcType)
    override def resultType(): DataType =
      PartitionField.dirType(field, srcType)
    override def name(): String = fname
    override def canonicalName(): String = {
      val z = if (srcType == org.apache.spark.sql.types.TimestampType)
        s",$zone" else ""
      s"graft.$fname(${srcType.catalogString}$z)"
    }
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): AnyRef = {
      val v: Any =
        if (input.isNullAt(0)) null
        else srcType match {
          case org.apache.spark.sql.types.DateType => input.getInt(0)
          case _ => input.getLong(0) // timestamp/NTZ micros
        }
      GraftBatchScan.derivedOf(field, v, srcType, zone)
        .map(_.asInstanceOf[AnyRef]).orNull
    }
  }

  private final class TruncateBound(w: Int, srcType: DataType, zone: String)
    extends ScalarFunction[AnyRef] {
    override def inputTypes(): Array[DataType] = Array(srcType)
    override def resultType(): DataType = srcType
    override def name(): String = s"truncate$w"
    override def canonicalName(): String =
      s"graft.truncate$w(${srcType.catalogString})"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): AnyRef = {
      val v: Any =
        if (input.isNullAt(0)) null
        else srcType match {
          case IntegerType => input.getInt(0)
          case LongType => input.getLong(0)
          case StringType => input.getUTF8String(0)
          case _ => null
        }
      GraftBatchScan.derivedOf(PartitionField.PTruncate(w, "c"), v, srcType,
        zone).map(_.asInstanceOf[AnyRef]).orNull
    }
  }

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): Murmur3 hidden-partitioning bucket id"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"bucket expects (numBuckets, col), got ${inputType.simpleString}")
      val srcType = inputType(1).dataType
      srcType match {
        case IntegerType | LongType | StringType => new BucketBound(srcType)
        case other => throw new UnsupportedOperationException(
          s"bucket over ${other.simpleString} is not a graft layout type")
      }
    }
  }

  /** Canonical name embeds the SOURCE type: Murmur3 of an int and of a
    * long differ, so bucket(8, int_col) and bucket(8, long_col) must
    * never report as the same partitioning. */
  private final class BucketBound(srcType: DataType)
    extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, srcType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String =
      s"graft.bucket(${srcType.catalogString})"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val v: Any =
        if (input.isNullAt(1)) null
        else srcType match {
          case IntegerType => input.getInt(1)
          case LongType => input.getLong(1)
          case StringType => input.getUTF8String(1)
          case _ => null
        }
      GraftBatchScan.bucketId(n, v, srcType).map(Int.box).getOrElse(
        throw new IllegalStateException(
          s"unbucketable value $v for ${srcType.simpleString}"))
    }
  }
}
