package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Minimal `private[sql]` bridge: rebuild a DataFrame from a logical plan
 * under ANOTHER SparkSession sharing the same SparkContext
 * (`Dataset.ofRows` is private[sql], hence this package). Used by
 * graft.ops.Graphs to run closure loops in an ISOLATED session whose
 * conf toggles (constraint propagation off) can never affect queries
 * planning concurrently on the caller's session.
 *
 * Only SELF-CONTAINED plans may cross sessions — in practice the
 * LogicalRDD leaves that `localCheckpoint` produces (they carry their
 * rows and output attributes and resolve identically under any session
 * of the same context). Callers checkpoint before lifting.
 */
object SessionBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
