package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql]` `Dataset.ofRows`: turn a hand-built
  * (or hand-transformed) `LogicalPlan` into a `DataFrame` on the session.
  * Lives in the `org.apache.spark.sql` namespace solely for access — the
  * standard pattern for extending Spark with plan-level functionality
  * that `SparkSessionExtensions` cannot reach after session creation.
  */
object PlanExec {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
