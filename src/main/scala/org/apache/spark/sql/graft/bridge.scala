package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the standard
  * technique for libraries that add native Catalyst expressions (the public
  * API only builds Columns from other Columns). */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the blocks held by a localCheckpoint'ed Dataset. `Dataset.unpersist`
    * is a no-op for these (the RDD is persisted directly, not through the
    * CacheManager), so iterative algorithms would otherwise leak one state
    * snapshot per checkpoint until GC. */
  def freeLocalCheckpoint(ds: org.apache.spark.sql.Dataset[_]): Unit =
    ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
