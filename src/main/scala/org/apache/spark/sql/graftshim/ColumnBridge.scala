package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Expression↔Column converters. Spark 4
  * removed the public `new Column(expr)` constructor (Connect decoupling);
  * the supported seams are SQL-function registration (which this engine
  * also does, via GraftExtensions) and this package-placed accessor — the
  * standard pattern third-party Catalyst extensions use. Living in an
  * `org.apache.spark.sql` subpackage grants `private[sql]` access; nothing
  * else in the engine touches Spark internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
