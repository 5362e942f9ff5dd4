package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed managed table with Iceberg-like snapshot semantics,
  * re-providing the reference's table layer (no Iceberg jars in this
  * environment — SURVEY.md §1.2, §7 stage 1).
  *
  * Layout per table under `root/<name>/`:
  *   - `data/<uuid>-<part>.parquet` — immutable data files
  *   - `manifest-<n>.txt`          — newline list of live data file names
  *   - `_schema.json`              — StructType JSON, fixed at create
  *                                   (catalog-owned schema, mirrors
  *                                   reference SparkDestinationStream.java:216)
  *   - `_current`                  — name of the live manifest; updated by
  *                                   atomic rename, so readers always see a
  *                                   complete snapshot (replaces Iceberg's
  *                                   catalog commit, reference SparkUtils.java:45-50)
  *
  * Mutations are copy-on-write at file granularity: a delete/upsert only
  * rewrites data files that actually contain affected rows (file pruning via
  * `input_file_name`), everything else is carried over by manifest reference.
  * That is the property that keeps a 100 TB table's update cost proportional
  * to touched data, not table size. Single-writer by design, like the
  * reference's one-sequential-gRPC-stream model (SURVEY.md §3).
  */
final class TableStore(spark: SparkSession, val root: String) {

  private def tdir(name: String): Path = Paths.get(root, name)
  private def dataDir(name: String): Path = tdir(name).resolve("data")

  def exists(name: String): Boolean = Files.exists(tdir(name).resolve("_current"))

  /** `partitionBy` columns give hive-style `col=value` data layout, so
    * reads with partition-key predicates prune whole directories at plan
    * time (the managed-table analogue of Iceberg partition pruning,
    * SURVEY.md §4). */
  def create(name: String, schema: StructType, overwrite: Boolean = false,
      partitionBy: Seq[String] = Nil, zoneCols: Seq[String] = Nil): Unit = {
    val d = tdir(name)
    if (Files.exists(d)) {
      require(overwrite, s"table $name already exists")
      deleteRecursively(d)
    }
    (partitionBy ++ zoneCols).foreach(c => require(schema.fieldNames.contains(c),
      s"column $c not in schema"))
    zoneCols.foreach { c =>
      val dt = schema(schema.fieldIndex(c)).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
        dt == org.apache.spark.sql.types.StringType,
        s"zone column $c must be numeric or string, got ${dt.simpleString}")
    }
    Files.createDirectories(dataDir(name))
    Files.createDirectories(d.resolve("stats"))
    Files.writeString(d.resolve("_schema.json"), schema.json)
    Files.writeString(d.resolve("_partitions"), partitionBy.mkString(","))
    Files.writeString(d.resolve("_zonecols"), zoneCols.mkString(","))
    commitManifest(name, Nil)
  }

  /** Columns with per-file min/max zone maps (file skipping for CDC). */
  def zoneCols(name: String): Seq[String] = {
    val p = tdir(name).resolve("_zonecols")
    if (!Files.exists(p)) Nil
    else Files.readString(p).trim.split(",").toSeq.filter(_.nonEmpty)
  }

  def partitionCols(name: String): Seq[String] = {
    val p = tdir(name).resolve("_partitions")
    if (!Files.exists(p)) Nil
    else Files.readString(p).trim.split(",").toSeq.filter(_.nonEmpty)
  }

  def drop(name: String): Unit = deleteRecursively(tdir(name))

  def schema(name: String): StructType =
    DataType.fromJsonFile(tdir(name).resolve("_schema.json"))

  /** Manifest-relative data file paths of the current snapshot. */
  def currentRelPaths(name: String): Seq[String] = {
    val cur = tdir(name).resolve("_current")
    val manifest = tdir(name).resolve(Files.readString(cur).trim)
    Files.readAllLines(manifest).asScala.toSeq.filter(_.nonEmpty)
  }

  /** Live data files (absolute paths) of the current snapshot. */
  def currentFiles(name: String): Seq[String] =
    currentRelPaths(name).map(f => dataDir(name).resolve(f).toString)

  def read(name: String): DataFrame = readFiles(name, currentFiles(name))

  /** Time travel: read the table as of an earlier snapshot (manifests are
    * immutable and retained — the analogue of Iceberg snapshot reads). */
  def readVersion(name: String, version: Int): DataFrame = {
    val manifest = tdir(name).resolve(f"manifest-$version%06d.txt")
    require(Files.exists(manifest), s"no snapshot $version for table $name")
    val files = Files.readAllLines(manifest).asScala.toSeq.filter(_.nonEmpty)
      .map(f => dataDir(name).resolve(f).toString)
    readFiles(name, files)
  }

  def currentVersion(name: String): Int =
    Files.readString(tdir(name).resolve("_current")).trim
      .stripPrefix("manifest-").stripSuffix(".txt").toInt

  private def readFiles(name: String, files: Seq[String]): DataFrame = {
    val sch = schema(name)
    if (files.isEmpty) spark.createDataFrame(new java.util.ArrayList[Row](), sch)
    else if (partitionCols(name).isEmpty) spark.read.schema(sch).parquet(files: _*)
    else spark.read.schema(sch)
      .option("basePath", dataDir(name).toString)
      .parquet(files: _*)
      .select(sch.fieldNames.map(col).toSeq: _*)
  }

  /** Append-only write: new data files + manifest, no existing file touched
    * (reference W1, SparkDestinationStream.java:229-232). */
  def append(name: String, df: DataFrame): Unit = {
    val newFiles = writeDataFiles(name, alignTo(schema(name), df))
    commitManifest(name, currentRelPaths(name) ++ newFiles)
  }

  /** Row-level delete (reference W2, SparkDestinationStream.java:124-135) as
    * an anti-filter copy-on-write: rewrite only files containing matches. */
  def delete(name: String, cond: Column): Unit = {
    val files = currentFiles(name)
    if (files.isEmpty) return
    val df = read(name)
    val affected = df.filter(cond).select(input_file_name().as("f"))
      .distinct().collect().map(r => fileName(r.getString(0))).toSet
    if (affected.isEmpty) return
    val affectedPaths = files.filter(p => affected.contains(fileName(p)))
    // SQL DELETE WHERE semantics: rows where cond is NULL are KEPT — a bare
    // !cond would silently drop them (NOT(NULL) filters the row out)
    val survivors = readFiles(name, affectedPaths)
      .filter(!coalesce(cond, lit(false)))
    val rewritten = writeDataFiles(name, survivors)
    commitManifest(name,
      currentRelPaths(name).filterNot(p => affected.contains(fileName(p)))
        ++ rewritten)
  }

  /** Net CDC application in ONE snapshot commit: drop every row whose key
    * appears in `keys`, then add `newRows` — the atomic replacement for the
    * reference's non-atomic delete-then-insert update
    * (SparkDestinationStream.java:110-114; README.md:74-77). */
  def applyNet(name: String, keys: DataFrame, newRows: DataFrame,
      keyCols: Seq[String]): Unit = {
    val sch = schema(name)
    val distinctKeys = keys.select(keyCols.map(col): _*).distinct()
    var carried = currentRelPaths(name)
    var rewritten = Seq.empty[String]
    if (carried.nonEmpty) {
      // Stage 1 — zone pruning: discard files whose key range cannot
      // intersect the batch, from manifest stats alone (no file opened).
      val candidates = pruneByZones(name, carried,
        keyBounds(distinctKeys, keyCols, zoneCols(name)))
      if (candidates.nonEmpty) {
        val candidatePaths = candidates.map(r => dataDir(name).resolve(r).toString)
        // Stage 2 — exact pruning: a semi join over the candidates marks
        // the files that truly hold affected keys. input_file_name() MUST
        // be projected in the scan stage, BEFORE the join: after a
        // non-broadcast (shuffled) join it evaluates in a post-shuffle
        // stage and returns "", which would silently mark nothing affected.
        val affected = readFiles(name, candidatePaths)
          .withColumn("__file", input_file_name())
          .join(distinctKeys, keyCols, "left_semi")
          .select(col("__file")).distinct()
          .collect().map(r => fileName(r.getString(0))).toSet
        if (affected.nonEmpty) {
          val affectedPaths = candidatePaths.filter(p => affected.contains(fileName(p)))
          val survivors = readFiles(name, affectedPaths)
            .join(distinctKeys, keyCols, "left_anti")
          rewritten = writeDataFiles(name, survivors)
          carried = carried.filterNot(p => affected.contains(fileName(p)))
        }
      }
    }
    val appended = writeDataFiles(name, alignTo(sch, newRows))
    commitManifest(name, carried ++ rewritten ++ appended)
  }

  /** Zone-pruned candidate files for a key batch — exposed for tests and
    * for callers that want to observe skipping behavior. */
  def candidateFilesForKeys(name: String, keys: DataFrame,
      keyCols: Seq[String]): Seq[String] =
    pruneByZones(name, currentRelPaths(name),
      keyBounds(keys.select(keyCols.map(col): _*).distinct(), keyCols, zoneCols(name)))

  /** Upsert = applyNet keyed by the new rows themselves. */
  def upsert(name: String, rows: DataFrame, keyCols: Seq[String]): Unit =
    applyNet(name, rows, rows, keyCols)

  /** Compaction: rewrite the current snapshot into `numFiles` fresh data
    * files (repartition, so a 100 TB table compacts in parallel). Many small
    * CDC batches fragment a table into per-batch files; compaction restores
    * scan efficiency. The rewrite is itself just a new snapshot — readers of
    * older versions are unaffected. */
  def compact(name: String, numFiles: Int = 0): Unit = {
    val cur = read(name)
    val df = if (numFiles > 0) cur.repartition(numFiles) else cur
    val rewritten = writeDataFiles(name, df)
    commitManifest(name, rewritten)
  }

  /** Snapshot expiry: drop manifests older than the last `keepLast` and
    * physically delete data files no surviving manifest references — the
    * maintenance op that bounds storage growth under copy-on-write. */
  def expireSnapshots(name: String, keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val d = tdir(name)
    val manifests = Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .filter(f => f.startsWith("manifest-") && f.endsWith(".txt"))
      .toSeq.sorted
    val current = Files.readString(d.resolve("_current")).trim
    val keep = (manifests.takeRight(keepLast) :+ current).distinct
    val live = keep.flatMap(m =>
      Files.readAllLines(d.resolve(m)).asScala.filter(_.nonEmpty)).toSet
    // delete unreferenced data files, then the expired manifests
    Files.walk(dataDir(name)).iterator().asScala.toSeq
      .filter(p => Files.isRegularFile(p))
      .filter(p => !live.contains(dataDir(name).relativize(p).toString))
      .foreach { p =>
        Files.delete(p)
        Files.deleteIfExists(statsPath(name, dataDir(name).relativize(p).toString))
        ()
      }
    manifests.filterNot(keep.contains).foreach(m => Files.delete(d.resolve(m)))
  }

  // ---- zone maps ----------------------------------------------------------

  /** Per-file min/max of the zone columns, captured at write time from the
    * fresh files' parquet footers (aggregate pushdown — no data scan) and
    * kept as tiny driver-readable sidecars. This is the Iceberg-manifest
    * column-stats idea: a mutation can discard files whose key range
    * cannot intersect the batch WITHOUT opening them — at 100 TB that is
    * the difference between touching a few files and listing-scanning the
    * whole table. */
  private def writeZoneStats(name: String, relPaths: Seq[String]): Unit = {
    val zc = zoneCols(name)
    if (zc.isEmpty || relPaths.isEmpty) return
    val sch = schema(name)
    val paths = relPaths.map(r => dataDir(name).resolve(r).toString)
    // ONE job for all fresh files (grouped by file), not one per file —
    // the data is page-cache hot right after the write. (A per-file
    // footer-only read via aggregate pushdown is the alternative when
    // re-scanning fresh data is too costly.)
    val aggs = zc.flatMap(c => Seq(min(col(c)), max(col(c))))
    val rows = spark.read.schema(sch).parquet(paths: _*)
      .groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    val byName = rows.map(r => fileName(r.getString(0)) -> r).toMap
    relPaths.foreach { rel =>
      byName.get(fileName(rel)).foreach { row =>
        val pairs = zc.zipWithIndex.map { case (c, i) =>
          s""""$c": [${statJson(row.get(2 * i + 1))}, ${statJson(row.get(2 * i + 2))}]"""
        }
        Files.writeString(statsPath(name, rel), pairs.mkString("{", ",", "}"))
      }
    }
  }

  private def statsPath(name: String, rel: String): Path = {
    val flat = rel.replace("/", "__")
    tdir(name).resolve("stats").resolve(s"$flat.json")
  }

  private def statJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case other => other.toString // numeric only — enforced at create()
  }

  /** Prune manifest files by zone overlap with the batch's key bounds.
    * Files without stats (or non-comparable bounds) stay candidates. */
  private def pruneByZones(name: String, relPaths: Seq[String],
      bounds: Map[String, (Any, Any)]): Seq[String] = {
    if (bounds.isEmpty) return relPaths
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    relPaths.filter { rel =>
      val sp = statsPath(name, rel)
      if (!Files.exists(sp)) true
      else {
        val node = mapper.readTree(Files.readString(sp))
        bounds.forall { case (c, (lo, hi)) =>
          val s = node.get(c)
          if (s == null || s.get(0).isNull || s.get(1).isNull) true
          else overlap(jsonVal(s.get(0)), jsonVal(s.get(1)), lo, hi)
        }
      }
    }
  }

  private def jsonVal(n: com.fasterxml.jackson.databind.JsonNode): Any =
    if (n.isTextual) n.textValue()
    else if (n.isIntegralNumber) n.longValue()
    else n.doubleValue()

  private def overlap(fMin: Any, fMax: Any, bMin: Any, bMax: Any): Boolean =
    (fMin, fMax, bMin, bMax) match {
      case (a: Long, b: Long, c: Long, d: Long) => b >= c && a <= d
      case (a: String, b: String, c: String, d: String) => b >= c && a <= d
      case _ =>
        (toD(fMin), toD(fMax), toD(bMin), toD(bMax)) match {
          case (Some(a), Some(b), Some(c), Some(d)) => b >= c && a <= d
          case _ => true // non-comparable → keep as candidate
        }
    }

  private def toD(v: Any): Option[Double] = v match {
    case x: Long => Some(x.toDouble); case x: Int => Some(x.toDouble)
    case x: Double => Some(x); case x: Float => Some(x.toDouble)
    case x: Short => Some(x.toDouble); case x: Byte => Some(x.toDouble)
    case _ => None
  }

  /** Batch key bounds (one tiny agg job) for zone pruning; only zone
    * columns participate. */
  private def keyBounds(keys: DataFrame, keyCols: Seq[String],
      zc: Seq[String]): Map[String, (Any, Any)] = {
    val cols = keyCols.filter(zc.contains)
    if (cols.isEmpty) return Map.empty
    val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val row = keys.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.flatMap { case (c, i) =>
      val (lo, hi) = (row.get(2 * i), row.get(2 * i + 1))
      if (lo == null || hi == null) None else Some(c -> ((lo, hi)))
    }.toMap
  }

  // ---- internals ----------------------------------------------------------

  /** Project/reorder columns to the table schema (fixed, catalog-owned). */
  private def alignTo(sch: StructType, df: DataFrame): DataFrame =
    df.select(sch.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)

  private def fileName(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  /** Write df as immutable data files; returns their manifest-relative
    * paths (hive-style `col=value/` subdirs for partitioned tables). Data
    * lands in a staging dir first so a failed job never pollutes `data/`. */
  private def writeDataFiles(name: String, df: DataFrame): Seq[String] = {
    val id = UUID.randomUUID().toString.take(8)
    val staging = tdir(name).resolve(s"_staging-$id")
    try {
      val pCols = partitionCols(name)
      val writer = df.write.mode("overwrite")
      (if (pCols.isEmpty) writer else writer.partitionBy(pCols: _*))
        .parquet(staging.toString)
      val parts = Files.walk(staging).iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.toString)
      val named = parts.zipWithIndex.map { case (p, i) =>
        val subDir = staging.relativize(p.getParent).toString
        val fn = f"$id-part$i%05d.parquet"
        val rel = if (subDir.isEmpty) fn else s"$subDir/$fn"
        val target = dataDir(name).resolve(rel)
        Files.createDirectories(target.getParent)
        Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
        rel
      }
      writeZoneStats(name, named)
      named
    } finally deleteRecursively(staging) // never strand staging garbage
  }

  private def commitManifest(name: String, files: Seq[String]): Unit = {
    // Single-writer guard: the store is single-writer by design (like the
    // reference's one sequential stream); an advisory lock turns a second
    // concurrent writer into a fast, loud failure instead of a corrupted
    // manifest chain. CREATE_NEW is atomic on POSIX filesystems.
    val d = tdir(name)
    val lock = d.resolve("_commit.lock")
    try {
      Files.write(lock, Array.emptyByteArray,
        java.nio.file.StandardOpenOption.CREATE_NEW)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"table $name has a concurrent writer (stale lock? delete $lock)")
    }
    try {
      val n = nextManifestId(name)
      val manifest = f"manifest-$n%06d.txt"
      Files.writeString(d.resolve(manifest), files.mkString("\n"))
      val tmp = d.resolve(s"_current.tmp-${UUID.randomUUID().toString.take(8)}")
      Files.writeString(tmp, manifest)
      Files.move(tmp, d.resolve("_current"), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally { Files.deleteIfExists(lock); () }
  }

  private def nextManifestId(name: String): Int = {
    val existing = Files.list(tdir(name)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(f => f.startsWith("manifest-") && f.endsWith(".txt"))
      .map(f => f.stripPrefix("manifest-").stripSuffix(".txt").toInt).toSeq
    if (existing.isEmpty) 1 else existing.max + 1
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
}

private object DataType {
  def fromJsonFile(p: Path): StructType =
    org.apache.spark.sql.types.DataType.fromJson(Files.readString(p))
      .asInstanceOf[StructType]
}
