package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression

/** Companion to GraftColumnBridge, placed in the classic package because
  * ColumnNodeExpression is private[classic]: rewrites any ColumnNode
  * wrapper left inside an Expression tree into a pure Expression, to a
  * fixpoint. Needed when a Column composed of API functions (ColumnNodes)
  * over bridged custom Expressions is handed to the SQL analyzer via a
  * FunctionRegistry builder — the SQL path has no node-conversion rule. */
private[sql] object GraftNodeConverter {
  def deepConvert(e: Expression): Expression =
    e.transformUp {
      case wrapped: ColumnNodeExpression =>
        deepConvert(ColumnNodeToExpressionConverter(wrapped.node))
    }
}
