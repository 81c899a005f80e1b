package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge + session function registration.
  *
  * `org.apache.spark.sql.classic.ExpressionUtils` and
  * `SparkSession.sessionState` are `private[sql]` at the Scala level (their
  * members are public in bytecode), so this one-file shim lives inside the
  * `org.apache.spark.sql` package tree to re-export the three operations the
  * graft library needs for its native expressions and aggregates. No Spark
  * internals are modified or shadowed.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL-callable function into an EXISTING session (the
    * imperative complement of SparkSessionExtensions.injectFunction, for
    * sessions created before the library loads — e.g. a driver-owned one). */
  def registerFunction(spark: SparkSession, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder)
}
