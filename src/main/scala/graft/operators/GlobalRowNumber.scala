package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global row numbering / prefix aggregation over a total
  * order — the scalable replacement for `row_number().over(Window
  * .orderBy(...))`, which Spark executes by moving ALL rows to a single
  * partition (the WindowExec "No Partition Defined" path; a non-starter
  * at 100 TB).
  *
  * Algorithm (the classic two-pass prefix-sum):
  *   1. `repartitionByRange` on the order columns — each partition holds
  *      a contiguous, sorted key range.
  *   2. Count rows per partition (map-side partial agg; P tiny rows move).
  *   3. Cumulative offsets per partition on the driver (P values).
  *   4. One `mapPartitions` pass assigns `offset(pid) + local index`.
  *
  * Output rn values are identical to the single-partition window as long
  * as the ordering is TOTAL (callers must include a tiebreak column —
  * with duplicate order keys, rows sharing a key keep an arbitrary but
  * stable relative order within the same run only).
  *
  * The range-partitioned intermediate is persisted so both passes see
  * identical range boundaries, and released before returning (the
  * result is local-checkpointed, making the operator eager). For pure
  * pagination, keyset (`start-after`) pagination needs no numbering at
  * all — this operator exists for when the row number itself is the
  * deliverable.
  */
object GlobalRowNumber {

  def apply(df: DataFrame, orderCols: Seq[Column],
            rnCol: String = "rn", numPartitions: Int = 0): DataFrame = {
    require(!df.columns.contains(rnCol),
      s"row-number column '$rnCol' collides with an existing column")
    val spark = df.sparkSession
    val ranged0 =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, orderCols: _*)
      else df.repartitionByRange(orderCols: _*)
    // persisted so the count pass and the numbering pass see the SAME
    // range boundaries — repartitionByRange samples per job, so two
    // evaluations of the lineage may split ranges differently, which
    // would misalign the offsets
    val ranged = ranged0.sortWithinPartitions(orderCols: _*).persist()
    // pass 1: per-partition counts (partial agg — one row per partition
    // crosses the wire)
    val counts = ranged
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = new Array[Long](maxPid + 2)
    var acc = 0L
    for (p <- 0 to maxPid) {
      offsets(p) = acc
      acc += counts.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(
      ranged.schema.fields :+ StructField(rnCol, LongType, nullable = false))
    // pass 2: sequential numbering inside each sorted range partition.
    // Materialized (localCheckpoint) so the ranged intermediate can be
    // unpersisted immediately — otherwise every call leaks one cached
    // dataset for the session's lifetime.
    val numbered = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var i = bc.value(pid)
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }(Encoders.row(outSchema)).localCheckpoint()
    ranged.unpersist()
    numbered
  }

  /** Distributed EXCLUSIVE prefix sum of `valueCol` (cast to long,
    * null = 0) over a total order: each row gets the sum of all
    * STRICTLY preceding rows' values. Same two-pass shape as [[apply]]
    * — per-partition partial sums, driver-side offsets (P values), one
    * numbering pass — so the single-partition
    * `sum().over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * -1))` form is never executed. The order must be total (include a
    * tiebreak column). */
  def prefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
                outCol: String = "cum_before",
                numPartitions: Int = 0): DataFrame = {
    // withColumn would silently replace (then drop) a user's __psv
    require(!df.columns.contains("__psv"),
      "input has a '__psv' column, which collides with the prefix-sum " +
        "temp column")
    require(!df.columns.contains(outCol),
      s"prefix-sum output column '$outCol' collides with an existing column")
    val spark = df.sparkSession
    val withV = df.withColumn("__psv", coalesce(valueCol.cast("long"), lit(0L)))
    val ranged0 =
      if (numPartitions > 0)
        withV.repartitionByRange(numPartitions, orderCols: _*)
      else withV.repartitionByRange(orderCols: _*)
    val ranged = ranged0.sortWithinPartitions(orderCols: _*).persist()
    val sums = ranged
      .groupBy(spark_partition_id().as("pid"))
      .agg(sum(col("__psv")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (sums.isEmpty) -1 else sums.keys.max
    val offsets = new Array[Long](maxPid + 2)
    var acc = 0L
    for (p <- 0 to maxPid) {
      offsets(p) = acc
      acc += sums.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val vIdx = ranged.schema.fieldIndex("__psv")
    val outSchema = StructType(
      ranged.schema.fields.patch(vIdx, Nil, 1) :+
        StructField(outCol, LongType, nullable = false))
    val summed = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var running = bc.value(pid)
      it.map { r =>
        val out = Row.fromSeq(
          r.toSeq.patch(vIdx, Nil, 1) :+ running)
        running += r.getLong(vIdx)
        out
      }
    }(Encoders.row(outSchema)).localCheckpoint()
    ranged.unpersist()
    summed
  }
}
