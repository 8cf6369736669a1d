package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * Spark 4 made `Column` front a backend-agnostic `ColumnNode`; the
  * classic-backend converters (`ExpressionUtils`) are `private[sql]`,
  * so this one-file shim lives under `org.apache.spark.sql` to expose
  * them to the graft expression library. No Spark internals are
  * modified — this is the supported classic-backend conversion, just
  * re-exported.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
