package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Expression <-> Column bridge.
  *
  * Spark 4 removed the public `Column(expr)` constructor; the supported
  * conversion lives in `classic.ExpressionUtils`, which is `private[sql]`.
  * This object sits in a subpackage of `org.apache.spark.sql` purely to
  * re-export those two calls to graft's custom Catalyst expressions
  * (e.g. [[graft.plans.ArrayDotProduct]]) — the standard extension-library
  * escape hatch, two delegating methods and nothing else.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
