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

  /** Column over a custom Expression — the classic-API conversion
    * (`ExpressionUtils.column`). Needed for expressions whose
    * arguments are model artifacts (PQ codebooks) too large to route
    * through an `expr(...)` string and required FOLDABLE by the
    * expression (a registry builder would receive attributes).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Inverse of [[column]]: the catalyst Expression behind a Column
    * (typically an UnresolvedAttribute for `col("x")`), so custom
    * expressions can take ordinary column children.
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
