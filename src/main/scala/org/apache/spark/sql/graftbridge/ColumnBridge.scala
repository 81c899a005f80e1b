package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge.
  *
  * `org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]` at the
  * Scala level (its methods are public in bytecode), so this one-file shim
  * lives inside the `org.apache.spark.sql` package tree to re-export the two
  * conversions the graft library needs for its native expressions and
  * aggregates. No Spark internals are modified or shadowed.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
