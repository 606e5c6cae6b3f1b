package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's private[sql] Column <-> Expression
  * converters, for registering graft's custom Catalyst expressions as
  * user-facing Columns (the standard extension-library pattern; Spark 4
  * routes Columns through ColumnNode, so plain `new Column(expr)` no
  * longer exists). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Fully ColumnNode-free expression tree. A Column built by composing
    * API functions over bridged expressions interleaves ColumnNode and
    * Expression layers; the DataFrame path converts them at plan
    * construction, but a FunctionRegistry builder must hand the analyzer
    * a pure Expression tree (the SQL analyzer has no node-conversion
    * rule), so convert to a fixpoint here. */
  def deepExpression(c: Column): Expression =
    classic.GraftNodeConverter.deepConvert(expression(c))

  /** Register a function on a live session's registry (sessionState is
    * private[sql]; the extensions conf only applies at session build). */
  def registerFunction(spark: SparkSession,
                       ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
