package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dot product of two float/double
  * vectors.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is a
  * higher-order function — evaluated interpreted, one closure call per
  * element, and it allocates an intermediate array. For similarity search
  * that is THE hot loop (corpus × queries × 64 dims), so this implements
  * the tight loop with whole-stage codegen (`doGenCode`): no allocation,
  * no virtual calls, stays inside the generated stage. Same accumulation
  * order (left-to-right, double accumulator) as the HOF formulation, so
  * for EQUAL-LENGTH vectors results are bit-identical with it. Mixed
  * float/double operands are allowed (each element widens to double) —
  * this is how LSH hyperplane dots run against float embeddings without a
  * per-row array cast. On mismatched lengths the two formulations diverge
  * by design: zip_with pads with nulls and yields NULL, while VectorDot
  * computes over the common prefix (documented, tested in
  * VectorExprsSpec).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs two array<float> or two array<double>, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lFloat = elemType(left) == FloatType
    val rFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $a.$getL($i) * (double) $b.$getR($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** All row-dots of a vector against a constant matrix in ONE expression:
  * `right` is the matrix flattened row-major (a single array literal →
  * ONE plan node), `rows` is the row count; the result is
  * `array<double>` of length `rows`.
  *
  * Exists for plan-size as much as for runtime: 24 LSH hyperplane dots
  * spelled as 24 VectorDot(vec, array(64 lits)) puts ~1500 literal nodes
  * into the plan and analysis/optimization alone cost ~0.6 s per query.
  * As one node with one fused loop, planning is O(1) and the whole
  * signature computation is a single codegen'd loop nest. */
case class MatVecDots(left: Expression, right: Expression, rows: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_vec_dots needs array<float|double> vec and array<double> " +
            s"matrix, got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val dim = m.numElements() / rows
    val n = math.min(x.numElements(), dim)
    val lFloat = elemType(left) == FloatType
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
        acc += xv * m.getDouble(r * dim + i)
        i += 1
      }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $dim = $b.numElements() / $rows;
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double[] $out = new double[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.$getL($i) * $b.getDouble($r * $dim + $i);
         |  }
         |  $out[$r] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVecDots =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}

  /** Codegen'd dot product of two vector columns. */
  def vec_dot(a: Column, b: Column): Column =
    column(VectorDot(expression(a), expression(b)))

  /** Codegen'd dots of a vector against every row of a constant matrix
    * (flattened row-major into one array literal). */
  def mat_vec_dots(v: Column, flatMatrix: Array[Double], rows: Int): Column =
    column(MatVecDots(expression(v),
      expression(org.apache.spark.sql.functions.typedLit(flatMatrix)), rows))

  /** Codegen'd L2 norm. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** Codegen'd cosine similarity. */
  def cosine_sim(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
