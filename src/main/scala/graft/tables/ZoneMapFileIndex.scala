package graft.tables

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Zone-map comparison + filter-bound extraction shared by the two pruning
  * paths: mutation-side [[TableStore]] key-batch pruning and plan-time
  * [[ZoneMapFileIndex]] scan pruning.
  *
  * Pruning is a pure OPTIMIZATION and must never drop a file that could
  * hold a matching row, so every helper here fails OPEN: an unsupported
  * filter shape, a non-comparable type pair, or a missing stat keeps the
  * file a candidate. */
private[tables] object ZoneStats {

  /** Attribute OR nested-struct-field chain → dotted stat-key path
    * (`a` / `a.b.c`). Nested predicate pushdown hands the scan
    * `GetStructField` chains over the relation's (physical) attributes;
    * stats sidecars key nested zone columns by the same dotted physical
    * path, so both prunings line up. */
  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case g: GetStructField => unapply(g.child).map(p =>
        s"$p.${g.extractFieldName}")
      case _ => None
    }
  }

  /** Three-way compare of two zone/filter values, or None when the pair
    * is not safely comparable (then the caller keeps the file).
    * Strings compare by CODE POINT — the order Spark's min/max computed
    * the stats in (UTF8String is UTF-8 byte order = code-point order).
    * Java's natural String order is UTF-16 code-UNIT order, which ranks
    * supplementary characters BELOW U+E000..U+FFFF and would mis-prune
    * corpora with emoji/CJK-extension text. */
  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long)     => Some(java.lang.Long.compare(x, y))
    case (x: String, y: String) => Some(cmpCodePoints(x, y))
    case _ =>
      (toD(a), toD(b)) match {
        case (Some(x), Some(y)) if !x.isNaN && !y.isNaN =>
          Some(java.lang.Double.compare(x, y))
        case _ => None
      }
  }

  private def cmpCodePoints(x: String, y: String): Int = {
    var i = 0; var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx); j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  def toD(v: Any): Option[Double] = v match {
    case x: Long => Some(x.toDouble); case x: Int => Some(x.toDouble)
    case x: Double => Some(x); case x: Float => Some(x.toDouble)
    case x: Short => Some(x.toDouble); case x: Byte => Some(x.toDouble)
    case _ => None
  }

  /** File [mn, mx] intersects the (optionally half-open) query interval?
    * Any non-comparable pair → true (keep). */
  def overlap(mn: Any, mx: Any, lo: Option[Any], hi: Option[Any]): Boolean =
    lo.forall(l => cmp(mx, l).forall(_ >= 0)) &&
      hi.forall(h => cmp(mn, h).forall(_ <= 0))

  /** Per-column query intervals implied by a scan's data filters.
    * Only top-level CONJUNCTS of directly-supported shapes contribute
    * (attr vs literal equality and inequalities); everything else —
    * OR, casts, IN, functions — is ignored, which only loses pruning,
    * never rows. Strict > / < are widened to >= / <= (file-granular
    * pruning cannot exploit strictness). Keys are the relation's
    * (physical) attribute names. */
  def filterBounds(filters: Seq[Expression])
      : Seq[(String, Option[Any], Option[Any])] =
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(Attr(a), Literal(v, _)) => point(a, v)
      case EqualTo(Literal(v, _), Attr(a)) => point(a, v)
      case EqualNullSafe(Attr(a), Literal(v, _)) if v != null =>
        point(a, v)
      case EqualNullSafe(Literal(v, _), Attr(a)) if v != null =>
        point(a, v)
      case GreaterThan(Attr(a), Literal(v, _))        => lo(a, v)
      case GreaterThanOrEqual(Attr(a), Literal(v, _)) => lo(a, v)
      case LessThan(Literal(v, _), Attr(a))           => lo(a, v)
      case LessThanOrEqual(Literal(v, _), Attr(a))    => lo(a, v)
      case LessThan(Attr(a), Literal(v, _))           => hi(a, v)
      case LessThanOrEqual(Attr(a), Literal(v, _))    => hi(a, v)
      case GreaterThan(Literal(v, _), Attr(a))        => hi(a, v)
      case GreaterThanOrEqual(Literal(v, _), Attr(a)) => hi(a, v)
      // IN prunes as the value list's envelope [min, max] — sound at file
      // granularity (any matching row's value lies inside the envelope);
      // a list with any non-literal or non-stat-domain member contributes
      // nothing (fail open)
      case In(Attr(a), vs) if vs.nonEmpty =>
        val lits = vs.map {
          case Literal(v, _) => litVal(v)
          case _             => None
        }
        if (lits.exists(_.isEmpty)) Nil
        else {
          val sorted = sortVals(lits.flatten)
          sorted.map(s => (a, Some(s.head): Option[Any],
            Some(s.last): Option[Any])).toSeq
        }
      // long IN lists arrive as InSet (optimizer conversion above the
      // in-set threshold); same envelope treatment
      case InSet(Attr(a), hset) if hset.nonEmpty =>
        val lits = hset.toSeq.map(litVal)
        if (lits.exists(_.isEmpty)) Nil
        else {
          val sorted = sortVals(lits.flatten)
          sorted.map(s => (a, Some(s.head): Option[Any],
            Some(s.last): Option[Any])).toSeq
        }
      // startsWith(p) ⇒ value ∈ [p, next(p)) where next increments the
      // prefix's last code point; when no such upper bound exists (prefix
      // ends in U+10FFFF) only the lower bound applies
      case StartsWith(Attr(a), Literal(p: UTF8String, _)) =>
        val s = p.toString
        Seq((a, Some(s): Option[Any], prefixUpper(s): Option[Any]))
      case _ => Nil
    }

  /** Sort stat-domain values with [[cmp]]; None if any pair is not
    * comparable (mixed types in one IN list — fail open). */
  private def sortVals(vs: Seq[Any]): Option[Seq[Any]] =
    try Some(vs.sortWith((a, b) =>
      cmp(a, b).getOrElse(throw new IllegalArgumentException) < 0))
    catch { case _: IllegalArgumentException => None }

  /** Smallest string STRICTLY above every string with prefix `s`, by code
    * point: increment the last code point, dropping any that are already
    * at the maximum. Empty result = unbounded. The bound is inclusive-safe:
    * it itself is > every prefixed string, and overlap checks are <=, so
    * keeping a file whose min equals the bound is merely conservative. */
  private def prefixUpper(s: String): Option[String] = {
    val cps = s.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) == Character.MAX_CODE_POINT) i -= 1
    if (i < 0) None
    else Some(new String(cps.take(i), 0, i) + new String(
      Character.toChars(cps(i) + 1)))
  }

  /** Per-column EXACT candidate-value sets implied by a scan's filters —
    * the bloom-probe companion of [[filterBounds]]. Only conjuncts whose
    * match set is exactly enumerable contribute (equality, IN/InSet with
    * all-literal members); each entry means "a matching row's value IS
    * one of these", so a file may be dropped when its bloom rejects
    * every candidate. Null members are dropped (SQL equality never
    * matches null); a conjunct with any non-literal or out-of-domain
    * member contributes nothing (fail open). Values are Long (integral
    * cols) or String — the only types blooms are built for. */
  def eqProbes(filters: Seq[Expression]): Seq[(String, Seq[Any])] =
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, Literal(v, _)) => probe(a.name, Seq(v))
      case EqualTo(Literal(v, _), a: AttributeReference) => probe(a.name, Seq(v))
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v != null =>
        probe(a.name, Seq(v))
      case EqualNullSafe(Literal(v, _), a: AttributeReference) if v != null =>
        probe(a.name, Seq(v))
      case In(a: AttributeReference, vs) if vs.nonEmpty =>
        val lits = vs.map { case Literal(v, _) => Some(v); case _ => None }
        if (lits.exists(_.isEmpty)) Nil
        else probe(a.name, lits.flatten.filter(_ != null))
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        probe(a.name, hset.toSeq.filter(_ != null))
      case _ => Nil
    }

  private def probe(c: String, vs: Seq[Any]): Seq[(String, Seq[Any])] = {
    if (vs.isEmpty) return Nil
    val conv = vs.map(litVal)
    // every member must land in the bloom domain (Long/String) — a Double
    // never went into an integral/string bloom, so fail open on any
    if (conv.exists(v => !v.exists(x => x.isInstanceOf[Long] ||
        x.isInstanceOf[String]))) Nil
    else Seq((c, conv.flatten))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  private def point(c: String, v: Any) =
    litVal(v).map(x => (c, Some(x): Option[Any], Some(x): Option[Any])).toSeq
  private def lo(c: String, v: Any) =
    litVal(v).map(x => (c, Some(x): Option[Any], None: Option[Any])).toSeq
  private def hi(c: String, v: Any) =
    litVal(v).map(x => (c, None: Option[Any], Some(x): Option[Any])).toSeq

  /** Catalyst literal → the stat domain (Long / Double / String); None for
    * anything else (Decimal, intervals, binary — no pruning attempted). */
  def litVal(v: Any): Option[Any] = v match {
    case null            => None
    case x: Byte         => Some(x.toLong)
    case x: Short        => Some(x.toLong)
    case x: Int          => Some(x.toLong)
    case x: Long         => Some(x)
    case x: Float        => Some(x.toDouble)
    case x: Double       => Some(x)
    case x: UTF8String   => Some(x.toString)
    case _               => None
  }
}

/** Plan-time zone-map file skipping for [[TableStore.read]] — the managed
  * table's answer to Delta/Iceberg data skipping, but driven by Catalyst
  * itself: `FileSourceScanExec` hands this index the scan's pushed data
  * filters, `listFiles` drops every manifest file whose zone range cannot
  * intersect them, and only the survivors are planned into the scan.
  *
  * `store.read(t).filter($"k" between (a, b))` therefore touches the same
  * few files an explicit [[TableStore.readRange]] call would — no special
  * API needed, and it composes with joins/aggregations because the filter
  * reaches here through the optimizer. At 100 TB this is the difference
  * between planning a handful of splits and planning the whole table.
  * Exactness is untouched: surviving files still evaluate the full
  * predicate row-by-row; pruning only removes files that cannot match.
  *
  * Hive-partitioned tables compose BOTH prunings: `partitionSchema` is
  * surfaced so Catalyst splits the predicate into partition filters
  * (evaluated here against each directory's parsed values — whole
  * directories drop) and data filters (zone-pruned per file within the
  * surviving directories). That is the Iceberg/Delta layering: partition
  * pruning for the coarse layout, min/max skipping inside it.
  *
  * The file list and stats are captured at construction, so a DataFrame
  * keeps reading its snapshot even if the table commits afterwards (same
  * isolation the explicit-file-list path gives).
  *
  * @param groups   data files of the snapshot, grouped by partition
  *                 directory with the directory's parsed partition values
  *                 (a single `InternalRow.empty` group when unpartitioned);
  *                 pre-listed — no FS calls here
  * @param stats    full file path → zone column (physical name) →
  *                 (min, max); missing file/column = unknown = never pruned
  * @param partitionSchema partition columns (PHYSICAL names) in layout order
  * @param totalRows exact row count of the snapshot (from the
  *                 consolidated per-file counts) when EVERY file has one
  *                 — lets [[MetadataAggregateRule]] answer `count(*)`
  *                 without planning a scan; None = unknown
  * @param columnBounds exact global (min, max) per PHYSICAL zone column,
  *                 present only when EVERY file of the snapshot recorded
  *                 a bound for it (an all-null or legacy file removes
  *                 the column) — the min/max companion of totalRows.
  *                 Null-ignoring like SQL min/max, since the per-file
  *                 stats are
  * @param bloomCols columns (PHYSICAL names) with per-file bloom sidecars
  * @param bloomLoad lazy sidecar loader (full file path, physical column)
  *                 → filter; None = absent/corrupt = keep the file. Loaded
  *                 ONLY when an equality/IN filter targets a bloom column,
  *                 and only for files that survived zone pruning — blooms
  *                 are KBs each, so eager loading would tax every scan for
  *                 metadata point lookups rarely need. Results are cached
  *                 per index instance (one scan plans listFiles repeatedly).
  */
final class ZoneMapFileIndex(
    groups: Seq[(InternalRow, Seq[FileStatus])],
    stats: Map[String, Map[String, (Any, Any)]],
    roots: Seq[HPath],
    override val partitionSchema: StructType,
    bloomCols: Set[String] = Set.empty,
    bloomLoad: (String, String) => Option[org.apache.spark.util.sketch.BloomFilter] =
      (_, _) => None,
    val totalRows: Option[Long] = None,
    val columnBounds: Map[String, (Any, Any)] = Map.empty,
    buckets: Map[String, Map[String, (Int, Int, org.apache.spark.sql.types.DataType)]] =
      Map.empty,
    /** (store, table, pinned version) this index was planned for — lets
      * plan rules ([[MvRewriteRule]]) identify the scanned table and the
      * exact snapshot behind a V1 relation; None for ad-hoc indexes. */
    val owner: Option[(TableStore, String, Int)] = None)
  extends FileIndex {

  /** Unpartitioned: one anonymous group holding every file. */
  def this(statuses: Seq[FileStatus],
      stats: Map[String, Map[String, (Any, Any)]], roots: Seq[HPath]) =
    this(Seq((InternalRow.empty, statuses)), stats, roots, new StructType())

  private val bloomCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), Option[org.apache.spark.util.sketch.BloomFilter]]
  private def bloomOf(path: String, c: String) =
    bloomCache.getOrElseUpdate((path, c), bloomLoad(path, c))

  private def allStatuses: Seq[FileStatus] = groups.flatMap(_._2)

  /** (candidates, survivors) of the most recent listing — observability
    * hook for specs and for scan diagnostics. Counts FILES, after both
    * partition and zone pruning. */
  @volatile var lastScanCounts: Option[(Int, Int)] = None

  override def rootPaths: Seq[HPath] = roots
  override def inputFiles: Array[String] =
    allStatuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = allStatuses.map(_.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val total = groups.map(_._2.size).sum
    val partPruned =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) groups
      else {
        // bind by name: relation output and partitionSchema share the
        // physical spelling, so fieldIndex resolves exactly
        val pred = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val i = partitionSchema.fieldIndex(a.name)
              BoundReference(i, partitionSchema(i).dataType, nullable = true)
          })
        groups.filter { case (values, _) => pred.eval(values) }
      }
    val bounds = ZoneStats.filterBounds(dataFilters)
    val eqp =
      if (bloomCols.isEmpty && buckets.isEmpty) Nil
      else ZoneStats.eqProbes(dataFilters)
    val probes = eqp.filter { case (c, _) => bloomCols.contains(c) }
    // hidden bucket partitioning: an equality/IN conjunct on a bucketed
    // SOURCE column prunes every file whose directory bucket none of the
    // candidate values hashes into — zero sidecar reads, pure arithmetic.
    // Bucket ids per (n, value) are memoized across files.
    val bucketProbeCols: Set[String] =
      if (buckets.isEmpty) Set.empty
      else eqp.map(_._1).toSet.intersect(
        buckets.valuesIterator.flatMap(_.keysIterator).toSet)
    val bucketIdCache = scala.collection.mutable.Map.empty[(Int, Any), Option[Int]]
    def survivesBuckets(path: String): Boolean = {
      if (bucketProbeCols.isEmpty) return true
      val fb = buckets.getOrElse(path, Map.empty)
      eqp.forall { case (c, vs) =>
        fb.get(c) match {
          case None => true
          case Some((n, b, dt)) => vs.exists { v =>
            bucketIdCache.getOrElseUpdate((n, v),
              PartitionField.bucketOf(n, v, dt)) match {
              case Some(id) => id == b
              case None     => true // out-of-domain value: fail open
            }
          }
        }
      }
    }
    val out = partPruned.map { case (values, statuses) =>
      val bucketSurviving =
        if (bucketProbeCols.isEmpty) statuses
        else statuses.filter(st => survivesBuckets(st.getPath.toString))
      val zoneSurviving =
        if (bounds.isEmpty) bucketSurviving
        else bucketSurviving.filter { st =>
          stats.get(st.getPath.toString).forall { cols =>
            bounds.forall { case (c, qlo, qhi) =>
              cols.get(c).forall { case (mn, mx) =>
                ZoneStats.overlap(mn, mx, qlo, qhi)
              }
            }
          }
        }
      // bloom probes run AFTER zone pruning so only remaining candidates
      // pay a sidecar read; each probed conjunct must have SOME candidate
      // value the file's bloom accepts, else the file provably has no
      // matching row
      val surviving =
        if (probes.isEmpty) zoneSurviving
        else zoneSurviving.filter { st =>
          probes.forall { case (c, vs) =>
            bloomOf(st.getPath.toString, c) match {
              case None => true // no sidecar — keep (fail open)
              case Some(b) => vs.exists {
                case l: Long   => b.mightContainLong(l)
                case s: String => b.mightContainString(s)
                case _         => true
              }
            }
          }
        }
      (values, surviving)
    }
    lastScanCounts = Some((total, out.map(_._2.size).sum))
    out.filter(_._2.nonEmpty)
      .map { case (v, s) => PartitionDirectory(v, s.toArray) }
  }
}

object ZoneMapFileIndex {
  /** Force `df` and return its scan's (candidate files, files scanned)
    * — the pruning-effectiveness observability hook gates and specs
    * assert against. (0, 0) when the plan has no zone-indexed relation
    * or nothing forced a listing. */
  def lastCountsOf(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    df.collect()
    // pattern-match, don't cast: a plan may also contain non-file
    // LogicalRelations (JDBC, in-memory) — those are skipped, not a
    // ClassCastException
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            Some(h.location)
          case _ => None
        }
    }.flatten.collectFirst { case z: ZoneMapFileIndex => z.lastScanCounts }
      .flatten.getOrElse((0, 0))
  }
}
