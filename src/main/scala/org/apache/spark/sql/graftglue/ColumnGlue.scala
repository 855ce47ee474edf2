package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Catalyst ⇄ Column glue for Spark 4.x, where `Column(expr)` / `col.expr`
 * became `private[sql]` (columns are ColumnNode-backed since the sql-api
 * unification). Living under org.apache.spark.sql gives access to the
 * package-private converters — the standard pattern for Catalyst-level
 * Spark extensions.
 */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
