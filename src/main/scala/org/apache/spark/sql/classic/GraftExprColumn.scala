package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API (Spark 4 moved Column onto ColumnNode; the Expression↔Column
  * converters live package-private in `org.apache.spark.sql.classic`).
  * Standard extension-library shim — no Spark internals are modified.
  */
object GraftExprColumn {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Session function registry (package-private in classic). */
  def functionRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
}
