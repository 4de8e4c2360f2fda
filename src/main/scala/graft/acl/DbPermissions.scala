package graft.acl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.catalog.GraftConfig

/** Live DB-backed permission store (J3/J4's database half).
  *
  * The reference reads per-(user, table) permission rows from a SQL
  * database at query time through sea-orm with an LRU memo
  * (/root/reference/src/database.rs:28-52, table shape
  * /root/reference/src/permission.rs:4-12: `permissions(id, user_id,
  * table_name, partition_filters JSON)`), and merges the result with the
  * config's static filters before resolving the allowed file set
  * (/root/reference/src/main.rs:555-574).
  *
  * Spark-first restatement: the permissions table is read through
  * Spark's JDBC source — the (user, table) equality predicates are
  * PUSHED DOWN into the database query (the JDBC source translates
  * EqualTo filters into the WHERE clause), so the engine fetches only
  * the rows for the requesting principal, exactly like the reference's
  * filtered sea-orm find. Results flow into the SAME
  * [[PartitionAcl.parsePermissions]]/[[PartitionAcl.filtersFor]]/
  * [[PartitionAcl.merge]] chain the in-memory path uses, memoized per
  * (user, table) in [[AclCaches.dbPerms]] (the reference's `cached`
  * macro, LRU 100).
  *
  * Scale: permission rows are catalog-scale metadata (bytes per user ×
  * table) — a driver-side lookup memoized across queries, never a join
  * in the data path. The DB is read once per cache miss, not per file.
  *
  * URI scheme: the reference's config carries `sqlite:...` -style URIs;
  * [[jdbcUrl]] maps scheme-only URIs onto `jdbc:` URLs and passes
  * explicit `jdbc:` URIs through untouched, so any JDBC driver on the
  * classpath works (this environment ships Derby; SQLite works wherever
  * its driver jar is present).
  */
object DbPermissions {

  /** Map a reference-style database URI to a JDBC URL. */
  def jdbcUrl(uri: String): String =
    if (uri.startsWith("jdbc:")) uri else s"jdbc:$uri"

  /** Known embedded-driver classes by scheme — Spark's JDBC source needs
    * the driver class when DriverManager's autoloading races executor
    * classloaders. Unlisted schemes rely on JDBC 4 autoloading. */
  private def driverFor(url: String): Option[String] =
    if (url.startsWith("jdbc:derby:")) Some("org.apache.derby.jdbc.EmbeddedDriver")
    else if (url.startsWith("jdbc:sqlite:")) Some("org.sqlite.JDBC")
    else None

  /** The raw `permissions` table as a DataFrame (one row per grant). */
  def permissionsDF(spark: SparkSession, uri: String): DataFrame = {
    val url = jdbcUrl(uri)
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "permissions")
    driverFor(url).fold(reader)(d => reader.option("driver", d)).load()
  }

  /** DB filters for (user, table): empty when `databaseEnabled` is off
    * (the reference skips the DB lookup entirely then), else the decoded
    * `partition_filters` of the user's rows, LRU-memoized. */
  def filtersFor(spark: SparkSession, cfg: GraftConfig, user: String,
                 table: String): PartitionAcl.Filters =
    if (!cfg.databaseEnabled) Seq.empty
    // the memo key carries the database URI: a config reload pointing at
    // a DIFFERENT permissions DB must never serve the old DB's grants
    // (the memo has no TTL; staleness within ONE database is the
    // reference's documented LRU behavior, cross-database is not)
    else AclCaches.permsFor(s"${cfg.database.uri}#$user", table) {
      // the where() lands in the database's WHERE clause (JDBC filter
      // pushdown) — only this principal's rows cross the wire
      PartitionAcl.filtersFor(
        PartitionAcl.parsePermissions(
          permissionsDF(spark, cfg.database.uri)
            .where(col("user_id") === user && col("table_name") === table)),
        user, table)
    }

  /** Drop the memoized grants for (user, table) under this config's
    * database — the immediate-revocation hook (the memo has no TTL). */
  def invalidate(cfg: GraftConfig, user: String, table: String): Unit =
    AclCaches.dbPerms.invalidate(
      AclCaches.cacheKey(s"${cfg.database.uri}#$user", table))

  /** J4: the effective filter set = config statics ∪ DB grants — the
    * reference's merge at src/main.rs:555-574. */
  def mergedFilters(spark: SparkSession, cfg: GraftConfig, user: String,
                    alias: String): PartitionAcl.Filters =
    PartitionAcl.merge(cfg.staticFilters(alias),
      filtersFor(spark, cfg, user, alias))
}
