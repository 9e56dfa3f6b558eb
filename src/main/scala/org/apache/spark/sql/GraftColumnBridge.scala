package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the standard
  * technique for libraries that ship custom Catalyst expressions against
  * Spark 4's unified Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the storage blocks of a `localCheckpoint(eager = true)`'d
    * DataFrame. `Dataset.unpersist` only clears CacheManager entries; a
    * local checkpoint's data lives in the persisted RDD wrapped by its
    * `LogicalRDD`, which otherwise survives until the JVM garbage-collects
    * the RDD reference. Safe only once no downstream plan still needs the
    * data (lineage is truncated — the blocks cannot be recomputed).
    */
  def unpersistLocalCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.optimizedPlan.foreach {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking)
      case _                        =>
    }
}
