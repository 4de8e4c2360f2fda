package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.acl.PartitionAcl

/** A minimal Delta-style transaction log: versioned JSON commits of
  * add-file actions over a Hive-partitioned parquet layout, plus a
  * log-driven snapshot/pruning reader.
  *
  * This reproduces the part of the Delta protocol the reference engine
  * actually exercises (no Delta jars ship in this environment):
  *   - S4 snapshot load: replay the `_delta_log` JSON adds/removes
  *     (/root/reference/src/main.rs:344-367)
  *   - S5 log-as-data: the log itself is readable as a DataFrame
  *     (/root/reference/src/main.rs:532-538 proxies it verbatim)
  *   - P5 partition pruning: resolve union-of-conjunctive equality
  *     predicates to the exact file set from log METADATA only — no
  *     data IO (/root/reference/src/main.rs:388-415)
  *   - S9/P9 write path: append-only commits behind a read-only gate
  *     (/root/reference/src/main.rs:941-948, 1048-1110)
  *
  * Scale: the log is metadata (KBs per commit); snapshot replay is a
  * groupBy(path) over log entries — at 100 TB the data never moves, which
  * is the whole point of log-driven pruning. Single-writer only (no
  * concurrent-commit protocol) — documented limitation.
  */
object MiniDelta {

  final class ReadOnlyTableException(path: String)
    extends RuntimeException(s"405: table at $path is read-only")

  private def logDir(table: String) = s"$table/_delta_log"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nextVersion(spark: SparkSession, table: String): Long = {
    val dir = new Path(logDir(table))
    val f = fs(spark, table)
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max) + 1
  }

  /** S9 + P9: append `df` as a new commit. Writes Hive-partitioned
    * parquet, then logs the newly created files as add actions. */
  def append(spark: SparkSession, df: DataFrame, table: String,
             partitionBy: Seq[String], readOnly: Boolean = false): Long = {
    if (readOnly) throw new ReadOnlyTableException(table)
    val f = fs(spark, table)
    val beforePaths = listDataFiles(spark, table).map(_._1).toSet
    val writer = df.write.mode("append")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).parquet(table)
    val after = listDataFiles(spark, table)
    val added = after.filterNot { case (p, _) => beforePaths.contains(p) }
    val version = nextVersion(spark, table)
    writeCommit(spark, table, version,
      added.map { case (p, s2) => addLine(p, s2) }, "WRITE")
    version
  }

  private def listDataFiles(spark: SparkSession,
                            table: String): Seq[(String, Long)] = {
    val root = new Path(table)
    val f = fs(spark, table)
    if (!f.exists(root)) return Seq.empty
    val it = f.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val rootUri = root.toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val s = it.next()
      val p = s.getPath.toUri.getPath
      if (p.endsWith(".parquet") && !p.contains("_delta_log"))
        buf += ((p.stripPrefix(rootUri).stripPrefix("/"), s.getLen))
    }
    buf.toSeq
  }

  /** Delta-log action schema (the subset this engine writes/reads).
    * Explicit — JSON inference would type partitionValues as a struct of
    * the keys it happens to see instead of map<string,string>. */
  val logSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("commitInfo", StructType(Seq(
        StructField("operation", StringType),
        StructField("version", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("dataChange", BooleanType))))))
  }

  /** S5: the raw log as a DataFrame (one row per action). */
  def logDF(spark: SparkSession, table: String): DataFrame =
    spark.read.schema(logSchema).json(s"${logDir(table)}/*.json")

  private def writeCommit(spark: SparkSession, table: String,
                          version: Long, lines: Seq[String],
                          operation: String): Unit = {
    val f = fs(spark, table)
    val commit =
      (s"""{"commitInfo":{"operation":"$operation","version":$version}}""" +:
        lines).mkString("\n")
    f.mkdirs(new Path(logDir(table)))
    val out = f.create(new Path(f"${logDir(table)}%s/$version%020d.json"),
      false)
    out.write(commit.getBytes("UTF-8"))
    out.close()
  }

  private def addLine(rel: String, size: Long): String = {
    val parts = rel.split("/").dropRight(1)
      .filter(_.contains("="))
      .map { seg =>
        val Array(k, v) = seg.split("=", 2)
        s""""$k":"$v""""
      }.mkString(",")
    s"""{"add":{"path":"$rel","partitionValues":{$parts},"size":$size,"dataChange":true}}"""
  }

  /** Compaction (OPTIMIZE-style): rewrite the current snapshot into one
    * file per partition directory, committing removes for the old files
    * and adds for the rewritten ones. Old files stay on disk (vacuum is
    * out of scope); the snapshot no longer references them.
    *
    * Scale: at 100 TB compaction runs per-partition (coalesce within a
    * partition directory), exactly how OPTIMIZE binpacks; the log commit
    * is still metadata-only. Single-writer, like append. */
  def compact(spark: SparkSession, table: String,
              partitionBy: Seq[String], readOnly: Boolean = false): Long = {
    if (readOnly) throw new ReadOnlyTableException(table)
    val current = snapshotFiles(spark, table).collect()
    val oldPaths = current.map(_.getString(0)).toSet
    val data = spark.read.option("basePath", table)
      .parquet(current.map(r => s"$table/${r.getString(0)}").toIndexedSeq: _*)
    val before = listDataFiles(spark, table).map(_._1).toSet
    val writer = data.coalesce(1).write.mode("append")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
     else writer).parquet(table)
    val added = listDataFiles(spark, table)
      .filterNot { case (p, _) => before.contains(p) }
    val version = nextVersion(spark, table)
    val removes = oldPaths.toSeq.sorted.map(p =>
      s"""{"remove":{"path":"$p","dataChange":false}}""")
    writeCommit(spark, table, version,
      removes ++ added.map { case (p, s) => addLine(p, s) }, "OPTIMIZE")
    version
  }

  /** VACUUM: physically delete data files no longer referenced by the
    * current snapshot (files removed by compaction/overwrites). Returns
    * the deleted relative paths. No retention window here (the reference
    * environment has no concurrent readers); a production build would
    * keep files younger than a retention horizon for in-flight readers
    * and time travel. Time travel to pre-vacuum versions stops resolving
    * by design. */
  def vacuum(spark: SparkSession, table: String,
             readOnly: Boolean = false): Seq[String] = {
    if (readOnly) throw new ReadOnlyTableException(table)
    val live = snapshotFiles(spark, table).select("path")
      .collect().map(_.getString(0)).toSet
    val f = fs(spark, table)
    val onDisk = listDataFiles(spark, table).map(_._1)
    val dead = onDisk.filterNot(live.contains)
    dead.foreach(p => f.delete(new Path(s"$table/$p"), false))
    dead
  }

  /** Time travel: the snapshot as of `version` (inclusive) — replay adds
    * and removes only up to that commit. */
  def snapshotFilesAt(spark: SparkSession, table: String,
                      version: Long): DataFrame = {
    val log = logDF(spark, table)
      .withColumn("version",
        regexp_extract(input_file_name(), "([0-9]{20})\\.json", 1)
          .cast("long"))
      .where(col("version") <= version)
    val adds = log.where(col("add").isNotNull)
      .select(col("add.path").as("path"),
        col("add.partitionValues").as("partitionValues"),
        col("add.size").as("size"), col("version"))
    val addLatest = adds.groupBy("path").agg(max("version").as("add_v"))
    val removes = log.where(col("remove").isNotNull)
      .select(col("remove.path").as("path"), col("version"))
      .groupBy("path").agg(max("version").as("rm_v"))
    adds.join(addLatest, Seq("path"))
      .where(col("version") === col("add_v"))
      .join(removes, Seq("path"), "left")
      .where(col("rm_v").isNull || col("rm_v") < col("add_v"))
      .select("path", "partitionValues", "size")
  }

  /** S4: current snapshot = add actions replayed in version order, minus
    * files removed later. Pure log metadata. */
  def snapshotFiles(spark: SparkSession, table: String): DataFrame =
    snapshotFilesAt(spark, table, Long.MaxValue)

  // Snapshot cache: 20 entries / 120 s TTL, exactly the reference's moka
  // Delta-snapshot cache (/root/reference/src/main.rs:41,82-85). Like the
  // reference, writes do NOT invalidate — a snapshot may be up to 120 s
  // stale (documented quirk); call invalidateSnapshot for immediacy.
  private val snapshotCache =
    new graft.util.TtlCache[String, DataFrame](20, 120000L,
      onEvict = df => { df.unpersist(); () })

  /** [[snapshotFiles]] through the TTL cache, persisted — repeated
    * pruning queries replay the log once per 120 s, not per query. */
  def snapshotFilesCached(spark: SparkSession, table: String): DataFrame =
    snapshotCache.getOrElseUpdate(table)(snapshotFiles(spark, table).persist())

  def invalidateSnapshot(table: String): Unit = snapshotCache.invalidate(table)

  /** P5: resolve OR-of-ANDs string-equality partition filters against the
    * snapshot — predicate to file set with zero data IO, the reference's
    * central query (src/main.rs:402-405). Empty list / all-empty maps =
    * allow all (P7). */
  def filesForFilters(snapshot: DataFrame,
                      filters: PartitionAcl.Filters): DataFrame = {
    val conj = filters.filter(_.nonEmpty).map { m =>
      m.map { case (k, v) =>
        element_at(col("partitionValues"), k) === lit(v)
      }.reduce(_ && _)
    }
    if (conj.isEmpty) snapshot else snapshot.where(conj.reduce(_ || _))
  }

  /** Read the table THROUGH the pruned file set: scan only the files the
    * filters resolve to (the reference's authorize-then-fetch, J2+S6). */
  def readFiltered(spark: SparkSession, table: String,
                   filters: PartitionAcl.Filters): DataFrame = {
    val files = filesForFilters(snapshotFiles(spark, table), filters)
      .select("path").collect().map(r => s"$table/${r.getString(0)}")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.option("basePath", table).parquet(files.toIndexedSeq: _*)
  }
}
