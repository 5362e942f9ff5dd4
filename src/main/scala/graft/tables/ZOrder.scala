package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key for multi-dimensional file skipping —
  * the lakehouse `OPTIMIZE ZORDER BY` analogue (the capability Iceberg's
  * rewrite-with-sort-order gives the reference's tables for free).
  *
  * A single-column sort gives tight per-file zone ranges on that column
  * and USELESS ranges on every other (each file spans the full domain).
  * Interleaving the bits of several columns' range-buckets makes files
  * cover small hyper-rectangles instead, so [[TableStore.readRange]]
  * prunes on ANY clustered column — at 100 TB the difference between
  * touching ~sqrt-of-the-files and scanning the table for the second
  * predicate column.
  *
  * The mapping is a pruning HEURISTIC, never a correctness input: zone
  * maps are recomputed from the actual rows after the rewrite, so a
  * skewed bucket mapping only costs selectivity. Scaling uses one tiny
  * global min/max aggregate (2×cols doubles to the driver); bucket
  * computation is plain codegen'd long arithmetic per row.
  */
object ZOrder {

  /** Bits per column: 3 cols × 16 bits = 48-bit z-values, comfortably
    * inside a signed long; 65536 buckets per column is far finer than
    * any realistic file count. */
  val bits = 16

  /** The interleaved sort key for `cols` of `df`. Null and NaN values
    * bucket to the origin (they cluster together in the lowest files).
    * Numeric columns only — strings need a collation-aware fixed-width
    * prefix encoding and are rejected until someone needs them. */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 3,
      s"z-order interleaves 2-3 columns, got ${cols.size}")
    cols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"z-order column $c must be numeric, got " +
          df.schema(c).dataType.simpleString)
    }
    val n = cols.size
    val nb = (1L << bits).toDouble
    // one small job: global [min, max] per column
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spreads = cols.zipWithIndex.map { case (c, i) =>
      if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) lit(0L)
      else {
        val mn = row.getDouble(2 * i)
        val span = row.getDouble(2 * i + 1) - mn
        if (!(span > 0) || span.isInfinite) lit(0L) // constant / degenerate
        else {
          val scaled = floor((col(c).cast("double") - mn) / span * nb)
            .cast("long")
          val bucket = coalesce(
            least(lit((1L << bits) - 1), greatest(lit(0L), scaled)), lit(0L))
          // spread bit k of the bucket to position k*n + i of the z-value
          (0 until bits).map(k =>
            shiftleft(shiftright(bucket, k).bitwiseAND(lit(1L)), k * n + i))
            .reduce(_.bitwiseOR(_))
        }
      }
    }
    spreads.reduce(_.bitwiseOR(_))
  }
}
