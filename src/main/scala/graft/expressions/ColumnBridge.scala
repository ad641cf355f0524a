// Lives in org.apache.spark.sql to reach the private[sql] Column <-> Expression
// converters (classic.ExpressionUtils). This is the documented extension
// point shape for native Catalyst expressions in Spark 4: user expressions
// build an Expression tree and wrap it as a Column via the classic converter.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  /** Wrap a raw Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst Expression (classic session only). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
