package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression converters,
  * so library code can wrap a custom Catalyst Expression in a Column
  * without registering it in any session's function registry (the
  * registry route couples Column CONSTRUCTION to whichever session is
  * active on the calling thread — wrong session, failed resolution).
  * The package placement is the standard extension-library pattern for
  * reaching `private[sql]` API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Standard analysis-time wrong-argument-count error (the same one
    * built-ins raise), reachable from function builders outside the
    * sql package — `private[sql]` QueryCompilationErrors otherwise.
    */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected.toString), actual)
}
