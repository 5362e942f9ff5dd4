package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** First `hexDigits` nibbles of md5(input) as a long — the portable hash
  * primitive (graft.ops.PortableHash) without the intermediate hex string.
  *
  * The composed form `conv(substr(md5(x),1,n),16,10)` allocates the full
  * 32-char hex string, a substring, and a decimal string per row; in the
  * dedup pipelines that runs once per SHINGLE (millions of rows per
  * partition), and the allocations dominated the stage profile. This
  * expression assembles the same value directly from the digest bytes.
  * Value-identical to the composed form (tested), so the DuckDB oracle SQL
  * (`CAST('0x'||SUBSTR(MD5(x),1,n) AS BIGINT)`) still matches.
  */
case class Md5PrefixLong(child: Expression, hexDigits: Int)
    extends UnaryExpression {

  require(hexDigits > 0 && hexDigits <= 15, "hexDigits must fit a signed long")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix_long needs a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Util.prefixLong(input.asInstanceOf[UTF8String], hexDigits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Util.prefixLong($c, $hexDigits)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `hexDigits` nibbles of md5(s) packed big-endian into a long. */
  def prefixLong(s: UTF8String, hexDigits: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < hexDigits) {
      val b = digest(i / 2)
      val nib = if (i % 2 == 0) (b >> 4) & 0xF else b & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

object Md5Exprs {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}

  def md5_prefix_long(c: Column, hexDigits: Int): Column =
    column(Md5PrefixLong(expression(c), hexDigits))
}
