package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

/** `spark.sessionState` is `private[sql]`; extension libraries that want
  * to add SQL functions to an ALREADY-RUNNING session (the config-free
  * path next to `spark.sql.extensions`) need this one call re-exported.
  */
object FunctionRegistryBridge {
  def register(spark: org.apache.spark.sql.SparkSession,
               id: FunctionIdentifier, info: ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
