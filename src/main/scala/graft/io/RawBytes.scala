package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6/S7: raw object reads as DataFrames.
  *
  * The reference streams object bytes (full or ranged GET,
  * /root/reference/src/main.rs:712-789). In-engine, a full read is the
  * `binaryFile` source (path, modificationTime, length, content); a
  * ranged read is a substring slice of the content column — Spark's
  * parquet reader does real ranged IO internally (footer + column-chunk
  * reads), so the explicit form exists for raw/opaque objects
  * (multimodal payloads).
  *
  * Scale: binaryFile partitions by file; `spark.sql.files.maxPartitionBytes`
  * governs packing. Content is only materialized for selected rows —
  * filter on metadata first.
  */
object RawBytes {

  /** Full object scan: one row per file under `path`. */
  def read(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** HEAD-style metadata-only projection (no content materialization). */
  def head(spark: SparkSession, path: String): DataFrame =
    read(spark, path).select("path", "length", "modificationTime")

  /** Ranged read: bytes [start, start+len) of each object's content.
    * 1-based substr on binary, mirroring HTTP Range `bytes=a-b` with
    * a = start, b = start+len-1. */
  def ranged(df: DataFrame, start: Long, len: Long): DataFrame =
    df.withColumn("range_content",
      col("content").substr(lit(start + 1), lit(len)))
      .withColumn("range_start", lit(start))
      .withColumn("range_len", least(lit(len),
        greatest(col("length") - start, lit(0L))))
}
