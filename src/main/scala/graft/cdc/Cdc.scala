package graft.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** OpenCDC record model + decode semantics, re-expressed from the reference
  * (opencdc.proto:38-97; SparkDestinationStream.java:141-262). The wire
  * payload is row-oriented, schemaless JSON (raw bytes) or a structured
  * field map; the table schema is fixed and catalog-owned.
  */
sealed trait CdcOp
object CdcOp {
  /** opencdc.proto:38-49 — SNAPSHOT is an initial-load row, applied as
    * insert (routing mirrors SparkDestinationStream.java:94-108). */
  case object Create extends CdcOp
  case object Update extends CdcOp
  case object Delete extends CdcOp
  case object Snapshot extends CdcOp
  def fromString(s: String): CdcOp = s.toLowerCase match {
    case "create" => Create; case "update" => Update
    case "delete" => Delete; case "snapshot" => Snapshot
    case other => throw new IllegalArgumentException(s"unknown operation: $other")
  }
}

/** `Data` oneof — raw JSON bytes or structured fields (opencdc.proto:87-97). */
sealed trait CdcData
final case class RawData(bytes: Array[Byte]) extends CdcData {
  def this(s: String) = this(s.getBytes("UTF-8"))
}
object RawData { def apply(s: String): RawData = new RawData(s) }
final case class StructuredData(fields: Map[String, Any]) extends CdcData

/** One change event about one entity (opencdc.proto:51-74). `before` is
  * carried for model completeness; like the reference, apply only reads
  * `after` (SparkDestinationStream.java:218). */
final case class CdcRecord(
    position: Array[Byte],
    op: CdcOp,
    metadata: Map[String, String] = Map.empty,
    key: Option[CdcData] = None,
    before: Option[CdcData] = None,
    after: Option[CdcData] = None)

object CdcDecode {
  private val mapper = new ObjectMapper()

  /** Key decode, JSON path (reference F1, SparkDestinationStream.java:154-188):
    * the bytes must parse to a JSON *object*; bool/number/string values keep
    * native types; null and missing fields are silently dropped; arrays and
    * nested objects are rejected.
    */
  def keyFields(data: CdcData): Map[String, Any] = data match {
    case RawData(bytes) =>
      val node =
        try mapper.readTree(bytes)
        catch { case e: Exception =>
          throw new IllegalArgumentException("input data is not JSON", e) }
      if (node == null || !node.isObject)
        throw new IllegalArgumentException("input data is not JSON object")
      node.properties().asScala.flatMap { e =>
        val v = e.getValue
        if (v.isNull || v.isMissingNode) None
        else if (v.isBoolean) Some(e.getKey -> v.booleanValue())
        else if (v.isIntegralNumber) Some(e.getKey -> v.longValue())
        else if (v.isNumber) Some(e.getKey -> v.doubleValue())
        else if (v.isTextual) Some(e.getKey -> v.textValue())
        else throw new IllegalArgumentException(
          s"unsupported key field type for '${e.getKey}'")
      }.toMap
    // Structured path (reference F2, SparkDestinationStream.java:192-209).
    // The reference stringifies numbers/bools (String.valueOf) and relies on
    // implicit casts at compare time; we keep native types — documented
    // divergence, strictly safer (SURVEY.md §1.3).
    case StructuredData(fields) =>
      fields.flatMap {
        case (_, null) => None
        case (k, v: Boolean) => Some(k -> v)
        case (k, v: Int) => Some(k -> v.toLong)
        case (k, v: Long) => Some(k -> v)
        case (k, v: Float) => Some(k -> v.toDouble)
        case (k, v: Double) => Some(k -> v)
        case (k, v: String) => Some(k -> v)
        case (k, _) => throw new IllegalArgumentException(
          s"unsupported key field type for '$k'")
      }
  }

  /** Payload render: structured fields → JSON text so both payload forms
    * share one parse path (reference F4, SparkDestinationStream.java:244-251). */
  def payloadJson(data: CdcData): String = data match {
    case RawData(bytes) => new String(bytes, "UTF-8")
    case StructuredData(fields) =>
      val node = mapper.createObjectNode()
      fields.foreach { case (k, v) => putAny(node, k, v) }
      mapper.writeValueAsString(node)
  }

  /** Timestamps render as UTC `yyyy-MM-dd HH:mm:ss.SSS` strings — the form
    * Spark's JSON reader parses back to TimestampType losslessly at ms
    * precision under a UTC session. */
  private val tsFormat = {
    val f = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    f
  }

  private def putAny(node: ObjectNode, k: String, v: Any): Unit = v match {
    case null => node.putNull(k)
    case b: Boolean => node.put(k, b)
    case i: Int => node.put(k, i)
    case l: Long => node.put(k, l)
    case f: Float => node.put(k, f)
    case d: Double => node.put(k, d)
    case s: String => node.put(k, s)
    case t: java.sql.Timestamp => node.put(k, tsFormat.synchronized(tsFormat.format(t)))
    case t: java.time.LocalDateTime => // TIMESTAMP_NTZ row values
      node.put(k, t.format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")))
    case seq: Seq[_] =>
      val arr = node.putArray(k); seq.foreach(addAny(arr, _))
    case m: Map[_, _] =>
      val child = node.putObject(k)
      m.foreach { case (ck, cv) => putAny(child, ck.toString, cv) }
    case other => throw new IllegalArgumentException(
      s"unsupported payload value for '$k': ${other.getClass}")
  }
  private def addAny(arr: ArrayNode, v: Any): Unit = v match {
    case null => arr.addNull()
    case b: Boolean => arr.add(b)
    case i: Int => arr.add(i)
    case l: Long => arr.add(l)
    case f: Float => arr.add(f)
    case d: Double => arr.add(d)
    case s: String => arr.add(s)
    case other => throw new IllegalArgumentException(
      s"unsupported array element: ${other.getClass}")
  }

  /** Structured payload → typed Row aligned to the table schema — the
    * DIRECT path for StructuredData (reference F4 done right): no JSON
    * render+reparse, so nothing is lost to text formatting. Sub-millisecond
    * timestamps and 17-significant-digit doubles survive exactly (the JSON
    * round-trip truncated timestamps to ms — SURVEY.md §2 row F4 promised
    * this path). Missing fields become NULL (same as a schema'd JSON parse);
    * numeric widenings (int→long, float→double, integral→floating) follow
    * the JSON path's semantics.
    */
  def structToRow(fields: Map[String, Any],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(schema.fields.map(f =>
      fields.get(f.name).map(v => convertTo(v, f.dataType)).orNull).toIndexedSeq: _*)

  private def convertTo(v: Any, dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    (v, dt) match {
      case (null, _) => null
      case (b: Boolean, BooleanType) => b
      case (i: Int, IntegerType) => i
      case (i: Int, LongType) => i.toLong
      case (i: Int, DoubleType) => i.toDouble
      case (l: Long, LongType) => l
      case (l: Long, IntegerType) =>
        require(l >= Int.MinValue && l <= Int.MaxValue, s"int overflow: $l"); l.toInt
      case (l: Long, DoubleType) => l.toDouble
      case (i: Int, FloatType) => i.toFloat
      case (l: Long, FloatType) => l.toFloat
      case (f: Float, FloatType) => f
      case (f: Float, DoubleType) => f.toDouble
      case (d: Double, DoubleType) => d
      // integral-float normalization, struct path (F3): 12.0 → 12 for an
      // integer column, matching the JSON path's normalizeIntegralFloats
      case (d: Double, IntegerType) if d.isWhole =>
        require(d >= Int.MinValue && d <= Int.MaxValue, s"int overflow: $d"); d.toInt
      case (d: Double, LongType) if d.isWhole => d.toLong
      case (f: Float, IntegerType) if f.isWhole => f.toInt
      case (f: Float, LongType) if f.isWhole => f.toLong
      case (d: Double, FloatType) => d.toFloat
      case (s: String, StringType) => s
      case (t: java.sql.Timestamp, TimestampType) => t
      case (t: java.time.Instant, TimestampType) => t
      case (t: java.time.LocalDateTime, TimestampNTZType) => t
      case (d: java.sql.Date, DateType) => d
      case (d: java.time.LocalDate, DateType) => d
      case (seq: Seq[_], ArrayType(et, _)) => seq.map(convertTo(_, et))
      case (m: Map[_, _], MapType(kt, vt, _)) =>
        m.map { case (k, x) => convertTo(k, kt) -> convertTo(x, vt) }
      case (m: Map[_, _], st: StructType) =>
        structToRow(m.map { case (k, x) => k.toString -> x }, st)
      case (other, t) => throw new IllegalArgumentException(
        s"cannot convert ${other.getClass.getSimpleName} to ${t.simpleString}")
    }
  }

  /** Integral-float normalization (reference F3,
    * SparkDestinationStream.java:237-262): JSON has one number type, so a
    * `5.0` meant for an int column must become `5` before a schema-enforced
    * parse — Spark's JSON reader refuses float-literal→int even with an
    * explicit schema. The reference rewrites only top-level fields; we
    * recurse into arrays/objects (documented improvement, SURVEY.md §7). */
  def normalizeIntegralFloats(json: String): String = {
    val tree = mapper.readTree(json)
    mapper.writeValueAsString(normalizeNode(tree))
  }

  private def normalizeNode(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      o.fieldNames().asScala.toSeq.foreach { f =>
        val replaced: JsonNode = normalizeNode(o.get(f))
        o.replace(f, replaced); ()
      }
      o
    case a: ArrayNode =>
      (0 until a.size()).foreach { i =>
        val replaced: JsonNode = normalizeNode(a.get(i))
        a.set(i, replaced); ()
      }
      a
    case v if v.isFloatingPointNumber && v.canConvertToExactIntegral =>
      com.fasterxml.jackson.databind.node.LongNode.valueOf(v.longValue())
    case other => other
  }
}
