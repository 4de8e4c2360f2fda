package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic

/** Bridge to Spark 4's private[sql] `SparkSession.cloneSession` (same
  * pattern as [[DatasetShim]]): a clone shares the SparkContext and
  * cache but carries its OWN SQLConf copy — the lever that lets the
  * engine scope a scan-affecting conf (parquet field-id resolution) to
  * exactly the relations built through the clone, leaving the caller's
  * session untouched.
  */
object SessionBridge {
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()
}
