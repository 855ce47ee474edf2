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

/** RDD-level glue: reach the materialized RDD behind a localCheckpoint'd
  * Dataset (its analyzed plan is a LogicalRDD leaf) so callers can release
  * the checkpoint blocks DETERMINISTICALLY once a run's outputs are
  * durable — the ContextCleaner otherwise frees them only after GC. */
object RddGlue {
  def checkpointRdd(df: org.apache.spark.sql.Dataset[_])
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
