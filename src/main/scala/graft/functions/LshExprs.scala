package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket keys for a vector, as ONE codegen'd
  * expression.
  *
  * `left` is the vector (array<float|double>), `right` the hyperplanes
  * flattened row-major into a single array<double> literal (tables×bits
  * planes of the vector's dimension). The result is `array<bigint>` of
  * combined bucket keys `(table << 32) | signature` — one per table, or
  * two per table with `multiprobe` (the base bucket plus the bucket with
  * the least-confident bit flipped, i.e. the smallest |dot|; ties break
  * on the lower bit index).
  *
  * Why an expression and not composed built-ins: the spelled-out version
  * (24 hyperplane dots + per-bit CASE chains + argmin-struct probe
  * selection) planned to a ~1500-node tree costing ~0.5 s of analysis and
  * a comparable codegen-compile hit PER QUERY, and at execution each dot
  * was an interpreted higher-order fold. Here the whole signature
  * computation is one fused loop nest in whole-stage codegen, each dot
  * computed exactly once, and the plan carries a single node. The
  * combined long key also makes the bucket join a single-column join.
  */
case class LshBuckets(left: Expression, right: Expression,
    tables: Int, bits: Int, multiprobe: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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
          s"lsh_buckets needs array<float|double> vec and array<double> " +
            s"planes, got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val dim = m.numElements() / (tables * bits)
    val n = math.min(x.numElements(), dim)
    val lFloat = elemType(left) == FloatType
    val out = new Array[Long](tables * (if (multiprobe) 2 else 1))
    var o = 0
    var tb = 0
    while (tb < tables) {
      var sig = 0L
      var weakBit = 0
      var weakAbs = Double.MaxValue
      var b = 0
      while (b < bits) {
        var acc = 0.0
        val base = (tb * bits + b) * dim
        var i = 0
        while (i < n) {
          val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
          acc += xv * m.getDouble(base + i)
          i += 1
        }
        if (acc >= 0) sig |= (1L << b)
        val ab = math.abs(acc)
        if (ab < weakAbs) { weakAbs = ab; weakBit = b }
        b += 1
      }
      out(o) = (tb.toLong << 32) | sig; o += 1
      if (multiprobe) { out(o) = (tb.toLong << 32) | (sig ^ (1L << weakBit)); o += 1 }
      tb += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val nOut = tables * (if (multiprobe) 2 else 1)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val o = ctx.freshName("o")
      val tb = ctx.freshName("tb")
      val bi = ctx.freshName("bi")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val sig = ctx.freshName("sig")
      val weakBit = ctx.freshName("weakBit")
      val weakAbs = ctx.freshName("weakAbs")
      val ab = ctx.freshName("ab")
      val probe = if (multiprobe)
        s"$out[$o++] = ((long) $tb << 32) | ($sig ^ (1L << $weakBit));" else ""
      s"""
         |int $dim = $b.numElements() / ${tables * bits};
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long[] $out = new long[$nOut];
         |int $o = 0;
         |for (int $tb = 0; $tb < $tables; $tb++) {
         |  long $sig = 0L;
         |  int $weakBit = 0;
         |  double $weakAbs = Double.MAX_VALUE;
         |  for (int $bi = 0; $bi < $bits; $bi++) {
         |    double $acc = 0.0;
         |    int $base = ($tb * $bits + $bi) * $dim;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $a.$getL($i) * $b.getDouble($base + $i);
         |    }
         |    if ($acc >= 0) $sig |= (1L << $bi);
         |    double $ab = java.lang.Math.abs($acc);
         |    if ($ab < $weakAbs) { $weakAbs = $ab; $weakBit = $bi; }
         |  }
         |  $out[$o++] = ((long) $tb << 32) | $sig;
         |  $probe
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBuckets =
    copy(left = newLeft, right = newRight)
}

object LshExprs {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}

  /** Combined (table<<32 | signature) LSH bucket keys for a vector. */
  def lsh_buckets(v: Column, flatPlanes: Array[Double], tables: Int, bits: Int,
      multiprobe: Boolean = false): Column =
    column(LshBuckets(expression(v),
      expression(org.apache.spark.sql.functions.typedLit(flatPlanes)),
      tables, bits, multiprobe))
}
