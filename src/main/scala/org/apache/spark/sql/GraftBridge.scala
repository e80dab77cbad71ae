package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` column/expression plumbing so graft's custom
  * Catalyst expressions can surface as user-facing [[Column]]s. This is the
  * standard extension-library pattern (same access path Spark's own
  * `functions` object uses). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
