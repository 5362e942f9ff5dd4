package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a long key against a driver-built Bloom filter —
  * the DIY runtime filter behind [[graft.ops.ScaleOps.bloomJoin]].
  *
  * The filter rides into executors as a plan constant
  * (`addReferenceObj`, same mechanism Spark's own InjectRuntimeFilter
  * uses for its bloom subquery results), so the probe stays inside
  * whole-stage codegen: one virtual call per row, no UDF boundary, no
  * serialization per batch. Spark's sketch BloomFilterImpl is
  * Serializable, which is what makes the plan-constant route work.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs an integral key, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = input match {
    case l: Long => bloom.mightContainLong(l)
    case i: Int => bloom.mightContainLong(i.toLong)
    case s: Short => bloom.mightContainLong(s.toLong)
    case b: Byte => bloom.mightContainLong(b.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExprs {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}

  def bloom_might_contain(key: Column, bloom: BloomFilter): Column =
    column(BloomMightContain(expression(key), bloom))
}
