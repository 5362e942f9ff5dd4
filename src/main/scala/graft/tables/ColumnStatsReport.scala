package graft.tables

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.types._

/** DSv2 `Statistics.columnStats()` assembly from the store's metadata
  * layer ([[TableStore.columnStatsFor]]) — what turns the zone/null/NDV
  * ledgers into CBO inputs: with `spark.sql.cbo.enabled`, Catalyst's
  * filter/join estimation reads these as `attributeStats` (matched by
  * `attr.name == ref.describe()` in `DataSourceV2Relation
  * .transformV2Stats`), so a selectively-filtered dimension shrinks to
  * its ESTIMATED output size and wins broadcast decisions a raw
  * size-in-bytes estimate would lose. At 100 TB that is a shuffle of
  * the fact table traded for a broadcast.
  *
  * min/max must be CATALYST-internal values of the column type (CBO
  * feeds them to `EstimationUtils`); the sidecar domain is Long /
  * Double / String, so numeric types convert explicitly and strings
  * report NDV/nullCount only (CBO does not range-estimate strings).
  */
private[tables] object ColumnStatsReport {

  def build(store: TableStore, tbl: String, required: StructType)
      : java.util.Map[NamedReference, ColumnStatistics] = {
    val out = new java.util.HashMap[NamedReference, ColumnStatistics]()
    store.columnStatsFor(tbl).foreach { case (name, cs) =>
      if (required.fieldNames.contains(name)) {
        val minMax = cs.bounds.flatMap { case (lo, hi) =>
          for (l <- catalystBound(cs.dataType, lo);
               h <- catalystBound(cs.dataType, hi)) yield (l, h)
        }
        out.put(Expressions.column(name), new ColumnStatistics {
          override def distinctCount(): java.util.OptionalLong =
            cs.ndv.map(java.util.OptionalLong.of)
              .getOrElse(java.util.OptionalLong.empty())
          override def nullCount(): java.util.OptionalLong =
            cs.nullCount.map(java.util.OptionalLong.of)
              .getOrElse(java.util.OptionalLong.empty())
          override def min(): java.util.Optional[Object] =
            minMax.map(p => java.util.Optional.of(p._1))
              .getOrElse(java.util.Optional.empty())
          override def max(): java.util.Optional[Object] =
            minMax.map(p => java.util.Optional.of(p._2))
              .getOrElse(java.util.Optional.empty())
        })
      }
    }
    out
  }

  /** Sidecar-domain bound → catalyst-internal value of `dt`; None for
    * types CBO range logic doesn't take (strings, decimals) or a
    * domain mismatch (corrupt stats). */
  private def catalystBound(dt: DataType, v: Any): Option[Object] =
    (dt, v) match {
      case (LongType, x: Long) => Some(Long.box(x))
      case (IntegerType, x: Long) => Some(Int.box(x.toInt))
      case (ShortType, x: Long) => Some(Short.box(x.toShort))
      case (ByteType, x: Long) => Some(Byte.box(x.toByte))
      case (DoubleType, x: Double) => Some(Double.box(x))
      case (DoubleType, x: Long) => Some(Double.box(x.toDouble))
      case (FloatType, x: Double) => Some(Float.box(x.toFloat))
      case (FloatType, x: Long) => Some(Float.box(x.toFloat))
      case _ => None
    }
}
