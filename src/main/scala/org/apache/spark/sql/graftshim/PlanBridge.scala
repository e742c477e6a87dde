package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, ExperimentalMethods, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** Logical-plan round trip for custom operators: Spark 4's public
  * `DataFrame` no longer exposes `queryExecution`/`ofRows` — the
  * classic-backend classes do. Same shim technique as [[ColumnBridge]]:
  * re-export exactly the calls a custom LogicalPlan node needs to enter
  * and leave the public API.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[Row]].queryExecution.analyzed

  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[ClassicSession].experimental
}
