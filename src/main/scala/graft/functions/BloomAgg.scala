package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-group Bloom-filter build — the write-side companion of
  * [[BloomMightContain]], used by the table layer to compute ONE bloom
  * per fresh data file inside the same `groupBy(input_file_name)` job
  * that computes the zone min/max (no extra pass over the data).
  *
  * A native `TypedImperativeAggregate` rather than a `udaf`: the buffer
  * is the sketch `BloomFilter` object itself, mutated in place per row
  * and merged with `mergeInPlace` — an Aggregator's encoder would
  * serialize the multi-KB bitset on every update. Spark's own (internal)
  * runtime-filter aggregate takes the same shape.
  *
  * Keys: integral types go in as longs (`putLong` — matching
  * [[BloomMightContain]]'s `mightContainLong` probe), strings as UTF-8
  * bytes (`putBinary` = sketch `putString`/`mightContainString`
  * compatible). Nulls are skipped — SQL equality never matches null, so
  * a null never needs to probe true.
  *
  * All partial filters of one query share (expectedItems, fpp), so
  * `mergeInPlace` never sees incompatible sizes. eval() emits the
  * serialized filter (readable back via `BloomFilter.readFrom`).
  */
case class BloomBuildAggregate(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def prettyName: String = "bloom_build"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_build needs an integral or string key, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long        => buffer.putLong(l)
      case i: Int         => buffer.putLong(i.toLong)
      case s: Short       => buffer.putLong(s.toLong)
      case b: Byte        => buffer.putLong(b.toLong)
      case s: UTF8String  => buffer.putBinary(s.getBytes)
    }
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAggregate =
    copy(child = newChild)
}

object BloomAgg {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}

  /** `bloom_build(key)` as an aggregate Column. */
  def bloom_build(key: Column, expectedItems: Long, fpp: Double): Column =
    column(BloomBuildAggregate(expression(key), expectedItems, fpp)
      .toAggregateExpression())
}
