package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loading (see /root/repo/TESTDATA.md).
  *
  * `events.ts` has shipped in two layouts across driver testdata
  * generations: parquet TIMESTAMP(NANOS) — which Spark rejects
  * (PARQUET_TYPE_ILLEGAL) unless read as nanos-since-epoch via
  * `spark.sql.legacy.parquet.nanosAsLong`, then floor-converted to
  * microseconds — and plain TIMESTAMP(MICROS), which Spark reads as
  * TIMESTAMP_NTZ. Both normalize to session-TZ TimestampType here so every
  * downstream query and oracle comparison sees one schema.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(path(sfDir, name))

  /** events with ts normalized to microsecond TimestampType. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(sfDir, "events"))
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) layout
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // TIMESTAMP(MICROS) layout (read as NTZ or LTZ)
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
