package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 made these conversions
  * `private[sql]`; libraries that ship native expressions (our
  * vec_cosine/vec_dot) conventionally expose them through a shim in the
  * `org.apache.spark.sql` package — same approach as frameless/itachi-style
  * extension libraries. Public Spark API everywhere else.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
