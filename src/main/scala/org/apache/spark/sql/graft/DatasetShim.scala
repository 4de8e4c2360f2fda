package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into Spark 4's classic Dataset internals (private[sql]): build a
  * DataFrame from a raw LogicalPlan. Lives under org.apache.spark.sql so
  * the private[sql] accessor resolves; the rest of the engine stays in the
  * graft.* packages (same pattern as [[ColumnBridge]]).
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
