package graft.tables

import java.time.{Instant, LocalDate, ZoneId, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** One field of a table's partition spec: how a source column's values
  * name the partition directory a row lands in.
  *
  * `identity` is the classic hive layout: the raw value IS the directory
  * segment and the column is removed from data files. Every other
  * transform is HIDDEN partitioning — the Iceberg model the reference
  * inherits through its catalog (`SparkUtils.java:46`; `days(ts)` /
  * `bucket(n, id)` / `truncate(w, col)` are core Iceberg DDL): the
  * DERIVED value names the directory, the source column stays in the
  * data files, and queries keep filtering on the SOURCE column. The
  * store maps source-column predicates through the transform at plan
  * time — a `ts` range prunes `ts_day=` directories, a key equality
  * prunes to its `key_bucket=` directory — so users never reference the
  * derived column at all (that is what makes the partitioning hidden).
  *
  * Serialized form (in `_partitions` / `_partspecs.json`, one entry per
  * field): a bare physical column name (identity, the legacy format) or
  * `days(col)` / `hours(col)` / `months(col)` / `years(col)` /
  * `bucket(n,col)` / `truncate(w,col)`.
  */
sealed trait PartitionField {
  /** PHYSICAL source column name. */
  def source: String
  /** Hive directory key (`<dirName>=<value>/`); equals `source` for
    * identity. */
  def dirName: String
  /** Serialized spec form. */
  def render: String
  def isIdentity: Boolean = this.isInstanceOf[PartitionField.PIdentity]
}

object PartitionField {

  final case class PIdentity(source: String) extends PartitionField {
    def dirName: String = source
    def render: String = source
  }
  final case class PDays(source: String) extends PartitionField {
    def dirName: String = s"${source}_day"
    def render: String = s"days($source)"
  }
  final case class PHours(source: String) extends PartitionField {
    def dirName: String = s"${source}_hour"
    def render: String = s"hours($source)"
  }
  final case class PMonths(source: String) extends PartitionField {
    def dirName: String = s"${source}_month"
    def render: String = s"months($source)"
  }
  final case class PYears(source: String) extends PartitionField {
    def dirName: String = s"${source}_year"
    def render: String = s"years($source)"
  }
  // render uses ':' between width and column — the stored `_partitions`
  // list is comma-joined, so the serialized form must be comma-free;
  // parse accepts the conventional ',' spelling too (user input)
  final case class PBucket(n: Int, source: String) extends PartitionField {
    def dirName: String = s"${source}_bucket"
    def render: String = s"bucket($n:$source)"
  }
  final case class PTruncate(w: Int, source: String) extends PartitionField {
    def dirName: String = s"${source}_trunc"
    def render: String = s"truncate($w:$source)"
  }

  private val Fn = """^(days|hours|months|years)\(([^(),:]+)\)$""".r
  private val Fn2 = """^(bucket|truncate)\((\d+)\s*[,:]\s*([^(),:]+)\)$""".r

  /** Parse one serialized spec entry; a bare name is identity (the
    * pre-transform storage format, so legacy tables read unchanged). */
  def parse(s: String): PartitionField = s.trim match {
    case Fn("days", c)   => PDays(c.trim)
    case Fn("hours", c)  => PHours(c.trim)
    case Fn("months", c) => PMonths(c.trim)
    case Fn("years", c)  => PYears(c.trim)
    case Fn2("bucket", n, c)   => PBucket(n.toInt, c.trim)
    case Fn2("truncate", w, c) => PTruncate(w.toInt, c.trim)
    case bare if bare.nonEmpty && !bare.contains('(') => PIdentity(bare)
    case other => throw new IllegalArgumentException(
      s"unparseable partition spec entry: $other")
  }

  private val MicrosPerHour = 3600L * 1000000L
  private val MicrosPerDay = 24L * MicrosPerHour

  private def isTs(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  /** Type of the derived directory column. */
  def dirType(f: PartitionField, srcType: DataType): DataType = f match {
    case _: PIdentity => srcType
    case _: PDays     => DateType
    case _: PHours    => IntegerType // hours since epoch
    case _: PMonths   => IntegerType // months since 1970-01
    case _: PYears    => IntegerType // years since 1970
    case _: PBucket   => IntegerType
    case _: PTruncate => srcType
  }

  /** Validate transform/source-type compatibility (throws with a usable
    * message). Time transforms need a timestamp (or date for days);
    * bucket hashes int/long/string; truncate prefixes string or floors
    * int/long. */
  def validate(f: PartitionField, srcType: DataType): Unit = f match {
    case _: PIdentity => ()
    case _: PDays =>
      require(isTs(srcType) || srcType == DateType,
        s"days(${f.source}) needs a timestamp or date column, " +
          s"got ${srcType.simpleString}")
    case _: PHours | _: PMonths | _: PYears =>
      require(isTs(srcType),
        s"${f.render} needs a timestamp column, got ${srcType.simpleString}")
    case b: PBucket =>
      require(b.n > 1, s"bucket width must be > 1, got ${b.n}")
      require(Seq(IntegerType, LongType, StringType).contains(srcType),
        s"bucket(${f.source}) needs an int/bigint/string column, " +
          s"got ${srcType.simpleString}")
    case t: PTruncate =>
      require(t.w > 0, s"truncate width must be > 0, got ${t.w}")
      require(Seq(IntegerType, LongType, StringType).contains(srcType),
        s"truncate(${f.source}) needs an int/bigint/string column, " +
          s"got ${srcType.simpleString}")
  }

  /** True iff the derived directory value depends on the session
    * timezone: days/months/years over a ZONED timestamp go through a
    * session-zone cast-to-date (hours buckets epoch micros — zone-free;
    * NTZ and date sources pin UTC). A reader whose session zone differs
    * from the write-time zone derives a DIFFERENT value for the same
    * input, so any logic that treats "derived(x) ≠ partition value" as
    * proof of non-membership (e.g. equality-delete key-group scoping)
    * must skip these fields — a zone-shifted mismatch would fail
    * CLOSED and resurrect deleted rows. */
  def zoneDependent(f: PartitionField, srcType: DataType): Boolean =
    srcType == TimestampType && (f match {
      case _: PDays | _: PMonths | _: PYears => true
      case _ => false
    })

  /** Timezone the time transforms bucket in: the session zone for zoned
    * timestamps (same zone `Cast(ts, Date)` uses, so write layout and
    * prune bounds agree), UTC for NTZ/date (no zone — the stored local
    * value is the clock being bucketed). */
  private def zoneOf(srcType: DataType, sessionZone: String): ZoneId =
    if (srcType == TimestampType) ZoneId.of(sessionZone) else ZoneOffset.UTC

  /** Write-side Catalyst expression deriving the directory value from the
    * source column. Also used by the distributed row-level writer (the
    * spec string travels to tasks; the expression is rebuilt there). */
  def catalystExpr(f: PartitionField, src: Expression, srcType: DataType,
      sessionZone: String): Expression = {
    val zone = Some(sessionZone)
    def toDate: Expression =
      if (srcType == DateType) src else Cast(src, DateType, zone)
    def micros: Expression =
      // NTZ carries no zone: bucket the stored LOCAL clock value. The
      // UTC-pinned cast makes the instant micros equal the local micros.
      if (srcType == TimestampNTZType)
        UnixMicros(Cast(src, TimestampType, Some("UTC")))
      else UnixMicros(src)
    f match {
      case _: PIdentity => src
      case _: PDays  => toDate
      case _: PHours =>
        // floorDiv via pmod (pmod is non-negative): (x - pmod(x, H)) is
        // an exact multiple of H, and integral divide of a multiple is
        // the floor quotient — exact long arithmetic, no double rounding
        val h = Literal(MicrosPerHour)
        Cast(new IntegralDivide(Subtract(micros, Pmod(micros, h)), h),
          IntegerType, zone)
      case _: PMonths =>
        Add(Multiply(Subtract(Year(toDate), Literal(1970)), Literal(12)),
          Subtract(Month(toDate), Literal(1)))
      case _: PYears => Subtract(Year(toDate), Literal(1970))
      case b: PBucket =>
        Pmod(new Murmur3Hash(Seq(src)), Literal(b.n))
      case t: PTruncate => srcType match {
        case StringType => Substring(src, Literal(1), Literal(t.w))
        case IntegerType => Subtract(src, Pmod(src, Literal(t.w)))
        case _ => Subtract(src, Pmod(src, Literal(t.w.toLong)))
      }
    }
  }

  /** Bucket id of a probe value (stat-domain Long/String, converted back
    * to the column's declared type before hashing — Murmur3 is
    * type-sensitive). None = value outside the domain (fail open). */
  def bucketOf(n: Int, v: Any, srcType: DataType): Option[Int] = {
    val typed: Option[Any] = (v, srcType) match {
      case (l: Long, LongType) => Some(l)
      case (l: Long, IntegerType) if l.isValidInt => Some(l.toInt)
      case (l: Long, IntegerType) => None // can't equal any int value
      case (s: String, StringType) =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case _ => None
    }
    typed.map { tv =>
      Pmod(new Murmur3Hash(Seq(Literal.create(tv, srcType))), Literal(n))
        .eval(null).asInstanceOf[Int]
    }
  }

  /** Synthetic SOURCE-column bounds implied by a file's directory value —
    * the hook that makes the partitioning hidden: these bounds enter the
    * same per-file stats map zone pruning consults, so a range predicate
    * on the source column prunes directories without ever naming the
    * derived column. `dirValue` is the Catalyst-internal parsed value of
    * [[dirType]]; bounds are in the stat domain (Long micros for
    * timestamps, Long days for dates, Long/String for truncate). None =
    * no bounds derivable (identity/bucket — other mechanisms cover them). */
  def sourceBounds(f: PartitionField, dirValue: Any, srcType: DataType,
      sessionZone: String): Option[(Any, Any)] = {
    if (dirValue == null) return None
    val zone = zoneOf(srcType, sessionZone)
    def dayRangeMicros(startDay: LocalDate, endDayExcl: LocalDate): (Any, Any) = {
      val lo = startDay.atStartOfDay(zone).toInstant
      val hi = endDayExcl.atStartOfDay(zone).toInstant
      (microsOf(lo), microsOf(hi) - 1L)
    }
    f match {
      case _: PIdentity => None
      case _: PBucket   => None
      case _: PDays =>
        val d = dirValue.asInstanceOf[Int]
        if (srcType == DateType) Some((d.toLong, d.toLong))
        else {
          val day = LocalDate.ofEpochDay(d.toLong)
          Some(dayRangeMicros(day, day.plusDays(1)))
        }
      case _: PHours =>
        val h = dirValue.asInstanceOf[Int].toLong
        Some((h * MicrosPerHour, (h + 1) * MicrosPerHour - 1L))
      case _: PMonths =>
        val m = dirValue.asInstanceOf[Int].toLong
        val start = LocalDate.of(1970, 1, 1).plusMonths(m)
        Some(dayRangeMicros(start, start.plusMonths(1)))
      case _: PYears =>
        val y = dirValue.asInstanceOf[Int]
        val start = LocalDate.of(1970 + y, 1, 1)
        Some(dayRangeMicros(start, start.plusYears(1)))
      case t: PTruncate => srcType match {
        case StringType =>
          val p = dirValue.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
            .toString
          // [p, smallest string above every p-prefixed string]: the upper
          // bound is strictly above the true max — conservative for a
          // file max, which only ever keeps a file
          prefixUpper(p).map(u => (p: Any, u: Any))
        case _ =>
          val lo = dirValue match {
            case i: Int => i.toLong; case l: Long => l
          }
          Some((lo, lo + t.w - 1L))
      }
    }
  }

  private def microsOf(i: Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
      i.getNano / 1000L)

  /** Smallest string strictly above every string with prefix `s` (code
    * points); None when unbounded. Mirrors ZoneStats.prefixUpper. */
  private def prefixUpper(s: String): Option[String] = {
    val cps = s.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) == Character.MAX_CODE_POINT) i -= 1
    if (i < 0) None
    else Some(new String(cps.take(i), 0, i) + new String(
      Character.toChars(cps(i) + 1)))
  }
}
