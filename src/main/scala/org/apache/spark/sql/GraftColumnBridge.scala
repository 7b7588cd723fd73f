package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Public bridge for building `Column`s directly from Catalyst
  * expressions: Spark 4 made the conversion `private[sql]`
  * (`classic.ExpressionUtils`), but a library shipping its own native
  * expressions ([[graft.functions.SortedIntersectCount]]) needs it so
  * operators work WITHOUT requiring `GraftExtensions` to be installed on
  * the session (the function-registry route). This is the only file in
  * the Spark namespace and contains no logic.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
