package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Spark 4 keeps `Dataset.ofRows` (logical plan → DataFrame) and the
  * plan accessor behind `private[sql]`; a library that contributes its
  * own [[LogicalPlan]] nodes (see [[graft.plans.TopKPerKeyNode]])
  * still needs both. Same narrow re-export discipline as
  * [[ColumnBridge]] — nothing else from internals is touched.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
