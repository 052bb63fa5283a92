package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters.
  *
  * Spark 4 hides the Expression behind an opaque `ColumnNode`; extension
  * libraries that define custom Catalyst expressions (our
  * `graft.expressions.*`) need this one hop to expose them as user-facing
  * `Column`s. Lives under `org.apache.spark.sql` solely for access — no Spark
  * code is modified or copied.
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
