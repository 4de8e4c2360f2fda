package graft.acl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType}

/** Partition-filter ACL algebra.
  *
  * Reference semantics (/root/reference/src/main.rs:388-415, 555-594):
  *   - one filter map = conjunction of `col = value` equalities       [P2,P3]
  *   - a list of maps = disjunction (OR-of-ANDs), results deduped     [P4,A6]
  *   - empty filter LIST  => allow all (no restriction)               [P7]
  *   - empty MAP inside a list => skipped (never "deny all")          [P7]
  *   - partition values compared as STRINGS (Hive path encoding)      [P2]
  *   - authorization = membership of the requested file in the
  *     resolved allowed set (403 otherwise)                           [P6,J2]
  *   - static config filters are unioned with DB-stored per-user
  *     filters before resolution                                      [J4]
  *
  * Spark-first restatement: the predicate is a plain Catalyst `Column`, so
  * when applied over a partitioned table Catalyst's
  * PruneFileSourcePartitions resolves it to a file set with zero data IO —
  * exactly the reference's `get_file_uris_by_partitions` — and at 100 TB
  * the filter rides the scan (partition pruning + parquet predicate
  * pushdown), never a post-scan filter of the full data.
  */
object PartitionAcl {
  /** OR-of-ANDs filter set: outer Seq = OR, inner Map = AND. */
  type Filters = Seq[Map[String, String]]

  /** The ACL predicate as a Catalyst Column. Allow-all on an empty list or
    * when every map is empty (reference skips empty maps). */
  def predicate(filters: Filters): Column = {
    val conjunctions = filters.filter(_.nonEmpty).map { m =>
      m.map { case (k, v) => col(k).cast(StringType) === lit(v) }
        .reduce(_ && _)
    }
    if (conjunctions.isEmpty) lit(true) else conjunctions.reduce(_ || _)
  }

  /** Apply the ACL to a table scan (the governed-read path). */
  def apply(df: DataFrame, filters: Filters): DataFrame =
    df.where(predicate(filters))

  /** P5: resolve a filter set against a file-metadata DF -> allowed files
    * (metadata-only pruning; dedup is inherent — one row per file). */
  def allowedFiles(files: DataFrame, filters: Filters): DataFrame =
    files.where(predicate(filters))

  /** J2: requests allowed = semi join against the allowed-file set.
    * `allowed` is small resolved metadata — broadcast it. */
  def authorize(requests: DataFrame, allowed: DataFrame,
                key: String = "key"): DataFrame =
    requests.join(broadcast(allowed.select(key).distinct()), Seq(key),
      "left_semi")

  /** P6: the 403 side — requested files NOT in the allowed set. */
  def denied(requests: DataFrame, allowed: DataFrame,
             key: String = "key"): DataFrame =
    requests.join(broadcast(allowed.select(key).distinct()), Seq(key),
      "left_anti")

  /** J4: static config filters unioned with DB filters. */
  def merge(static: Filters, db: Filters): Filters = static ++ db

  /** F11/J3: decode a permissions DF carrying a JSON `partition_filters`
    * column (Array[Map[String,String]]) into per-(user, table) filter rows,
    * mirroring the reference's sea-orm JSON column
    * (/root/reference/src/permission.rs:4-12, src/database.rs:45-51). */
  def parsePermissions(perms: DataFrame,
                       jsonCol: String = "partition_filters"): DataFrame =
    perms.withColumn("filters",
      from_json(col(jsonCol), ArrayType(MapType(StringType, StringType))))

  /** Collect the merged filter set for (user, table) from a parsed
    * permissions DF — the driver-side "permission plan" step. The perms
    * table is small (catalog-scale); this is a driver lookup, not a join
    * in the data path. */
  def filtersFor(parsed: DataFrame, userId: String,
                 tableName: String): Filters = {
    import scala.jdk.CollectionConverters._
    parsed
      .where(col("user_id") === userId && col("table_name") === tableName)
      .select(explode(col("filters")).as("f"))
      .collect()
      .map(r => r.getMap[String, String](0).toMap)
      .toSeq
  }
}
