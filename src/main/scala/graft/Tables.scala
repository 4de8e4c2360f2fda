package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loading (see /root/repo/TESTDATA.md).
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark rejects
  * (PARQUET_TYPE_ILLEGAL). We read it as nanos-since-epoch via
  * `spark.sql.legacy.parquet.nanosAsLong` and floor-convert to microseconds
  * — the same truncation DuckDB applies when casting TIMESTAMP_NS to
  * TIMESTAMP, so oracle comparisons stay exact.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(path(sfDir, name))

  /** events with ts converted nanos -> microsecond TimestampType (floor). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(sfDir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
