package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` doorway the engine needs: constructing a
  * `DataFrame` from a custom `LogicalPlan` node (`Dataset.ofRows`).
  * Spark exposes planner-strategy INJECTION publicly
  * (`SparkSessionExtensions.injectPlannerStrategy`) but not plan
  * CONSTRUCTION, so every library that ships a custom operator hosts
  * this two-line shim inside the `org.apache.spark.sql` package tree.
  * Nothing else in the codebase touches non-public Spark API.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
