package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal private[sql] bridge: turns a hand-built (already resolved)
  * LogicalPlan into a DataFrame. Lives under `org.apache.spark.sql` solely
  * to satisfy the `private[sql]` scope of `classic.Dataset.ofRows` — the
  * standard extension-library pattern for registering custom logical plans
  * that have no SQL/DataFrame construction syntax.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
