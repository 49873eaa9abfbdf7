package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for `Dataset.ofRows` (private[sql]) so graft can wrap a
  * custom logical operator ([[graft.plans.SortedLwwDedup]]) into a public
  * DataFrame. Lives under `org.apache.spark.sql` purely for the access
  * qualifier — the standard extension-point pattern for third-party
  * operators that compose with the public Dataset API. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
