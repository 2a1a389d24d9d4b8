package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the Spark 4 `Column` facade and Catalyst
  * `Expression`s (Column no longer exposes `.expr` directly).
  */
object GraftExpr {
  def expression(c: Column): Expression =
    org.apache.spark.sql.GraftSqlShims.expression(c)
  def column(e: Expression): Column =
    org.apache.spark.sql.GraftSqlShims.column(e)
}
