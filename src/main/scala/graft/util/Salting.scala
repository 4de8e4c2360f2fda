package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted two-stage aggregation.
  *
  * A hot grouping key at 100 TB concentrates one reducer; salting fans a
  * key's rows across `saltBuckets` partial groups (stage 1), then merges
  * the partials (stage 2). Valid for any algebraic aggregate expressed as
  * (partial, merge) pairs — here sum/count/min/max composites.
  *
  * AQE's skew-join handling covers joins; this covers aggregations,
  * where AQE does not split skewed groups.
  */
object Salting {

  /** Salted groupBy-count: same result as df.groupBy(keys).count(), but
    * each key's rows first aggregate into up to `saltBuckets` partials. */
  def saltedCount(df: DataFrame, key: String,
                  saltBuckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))

  /** Salted sum of a grid-rounded column (exact; see Metrics.gridAvg). */
  def saltedGridSum(df: DataFrame, key: String, value: Column,
                    saltBuckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .withColumn("_v", round(value * 100))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col("_v")).as("_partial"))
      .groupBy(col(key))
      .agg((sum(col("_partial")) / 100.0).as("total"))
}
