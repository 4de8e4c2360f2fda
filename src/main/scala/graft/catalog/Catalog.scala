package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table catalog: logical alias -> physical storage path.
  *
  * Reference semantics: `tableMapping: HashMap<String,String>`
  * (/root/reference/src/config.rs:7, src/main.rs:69-76); unknown alias is a
  * hard 404 (src/main.rs:503-512). The reference exposes one virtual bucket
  * `datalake` (src/main.rs:115-141) and lists table aliases as S3
  * `CommonPrefixes` entries (src/main.rs:200-226).
  *
  * Scale note: the catalog is tiny metadata — it is always the broadcast
  * side of any join against request streams.
  */
final case class Catalog(entries: Seq[(String, String)]) {
  private val mapping: Map[String, String] = entries.toMap

  def resolveOpt(alias: String): Option[String] = mapping.get(alias)

  /** Unknown alias -> error (the reference's 404). */
  def resolve(alias: String): String =
    resolveOpt(alias).getOrElse(
      throw new NoSuchElementException(s"404: unknown table alias '$alias'"))

  def aliases: Seq[String] = entries.map(_._1)

  /** Catalog as a DataFrame (broadcast side of alias-resolution joins). */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("alias", "physical_path")
  }

  /** S1 ListBuckets: the single virtual bucket (src/main.rs:115-141).
    * Timestamp built via to_timestamp so it is session-timezone (UTC)
    * anchored, not JVM-default-timezone anchored. */
  def listBuckets(spark: SparkSession): DataFrame =
    spark.range(1).select(lit("datalake").as("name"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("creation_date"))

  /** S2 ListTables: aliases as CommonPrefixes (src/main.rs:200-226). */
  def listTables(spark: SparkSession): DataFrame =
    toDF(spark)
      .select(concat(col("alias"), lit("/")).as("common_prefix"))
      .orderBy("common_prefix")
}

object Catalog {
  /** Catalog over the fixture tables of one scale-factor directory. */
  def forSf(sfDir: String): Catalog =
    Catalog(Tables.names.map(n => n -> Tables.path(sfDir, n)))
}
