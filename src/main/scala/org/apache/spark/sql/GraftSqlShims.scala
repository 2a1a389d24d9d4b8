package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shim into `private[sql]` helpers: Spark 4's Column facade hides
  * the Catalyst expression; extensions conventionally bridge via a
  * class compiled into the sql package.
  */
object GraftSqlShims {
  /** Eagerly convert the Column's node tree to a concrete Catalyst
    * expression (EqualTo/And/...), so pattern-matching planners (e.g.
    * file pruning) see real operator classes instead of the lazy
    * `ColumnNodeExpression` facade.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
