package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Bridge into Spark's private[sql] streaming constructor: a V1
  * `Source.getBatch` result must carry `isStreaming = true` or
  * MicroBatchExecution asserts (Spark 4 enforces it). Real connectors
  * (Delta's DeltaSource included) re-brand their batch-planned
  * DataFrame through `internalCreateDataFrame` exactly like this; the
  * plan stays lazy — `toRdd` defers execution to the micro-batch. Lives
  * under org.apache.spark.sql so the private[sql] member resolves. */
object StreamingBridge {
  def asMicroBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The mirror: a `Sink.addBatch` frame arrives with a streaming
    * incremental plan that batch writers refuse — re-brand it batch
    * (same lazy plan) so the sink can hand it to a normal write path. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
