package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** DataFrame ↔ LogicalPlan bridge for custom operators.
  *
  * `Dataset.ofRows` is `private[sql]` in Spark 4, so libraries that
  * ship whole custom operators (logical node + strategy + exec)
  * expose it from a subpackage of `org.apache.spark.sql` — the same
  * extension-library pattern as [[ColumnBridge]]. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
