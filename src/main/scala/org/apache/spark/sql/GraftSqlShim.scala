package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so graft's custom
  * logical operators ([[graft.plans.TopKPerKeyNode]]) can be wrapped back
  * into a public DataFrame. This is the standard extension-library pattern:
  * one minimal object compiled into the `org.apache.spark.sql` package,
  * everything else lives in graft's own namespace.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
