package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal shim into `private[sql]` surface: building a DataFrame from
  * a custom LogicalPlan (the documented pattern for third-party
  * operators — same mechanism SparkSessionExtensions-based libraries
  * use). Nothing else from the private API is touched.
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
