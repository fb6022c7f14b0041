package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to `Dataset.ofRows` / the analyzed child plans,
  * which are `private[sql]`. Custom logical operators built by
  * libraries need exactly these two hooks; placing the shim under
  * `org.apache.spark.sql` is the established extension pattern for
  * that (no Spark internals are modified).
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
