package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` backend-agnostic and
  * hid the classic conversions behind `private[sql]`; the standard pattern
  * for libraries contributing native Catalyst expressions is a shim in an
  * `org.apache.spark.sql` subpackage.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
