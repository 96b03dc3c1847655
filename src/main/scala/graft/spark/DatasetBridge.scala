package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` bridge (the standard pattern for Spark
  * extension libraries that construct a DataFrame from a hand-built
  * LogicalPlan): graft's K41 manifest-stats read rewraps a scan's
  * LogicalRelation with a stats-bearing CatalogTable and needs
  * Dataset.ofRows to turn the plan back into a DataFrame. */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
