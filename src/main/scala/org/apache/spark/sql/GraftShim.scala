package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Bridge into `private[sql]` Dataset constructors — the standard pattern for
  * Spark extensions that introduce custom logical operators (the public
  * Column/Dataset API in Spark 4 wraps plan nodes, so building a DataFrame
  * from a LogicalPlan requires this package-private hop).
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan
}
