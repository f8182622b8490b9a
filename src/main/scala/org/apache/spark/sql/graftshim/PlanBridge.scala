package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` LogicalPlan↔DataFrame seams, same pattern
  * as ColumnBridge: Spark 4 exposes no public way to wrap a custom
  * LogicalPlan node into a DataFrame (Connect decoupling); third-party
  * Catalyst extensions use a package-placed accessor. Only the engine's
  * custom-plan API (graft.plans.AsofJoin) goes through here.
  */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The ANALYZED plan of a DataFrame (attributes resolved, ready to be
    * referenced by a parent custom node). */
  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
