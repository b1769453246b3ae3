package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so graft's custom
  * logical operators (graft.plans.*) can surface as DataFrames. This is
  * the standard technique Spark extension libraries use — the whole
  * extension API (strategies, rules) exchanges LogicalPlans, but the
  * only sanctioned DataFrame constructor from a plan lives behind
  * `private[sql]`. Kept to this single call, nothing else internal. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
