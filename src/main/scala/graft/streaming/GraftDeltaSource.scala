package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.io.MiniDelta

/** `spark.readStream.format("graft-delta")` — the MiniDelta log as a
  * Structured Streaming source, replacing the bespoke driver loop
  * (`MiniDelta.processChanges`/`processCdf`) with the engine-managed
  * offset/commit lifecycle the reference's consumers expect of a Delta
  * stream (tables written by one engine, tailed by another —
  * /root/reference/src/main.rs:357-363).
  *
  * Same V1 `Source` shape as Delta Lake's own `DeltaDataSource`: each
  * micro-batch is a DataFrame of the commits in `(start, end]`, offsets
  * are table VERSIONS (checkpointed by the engine as JSON longs), so a
  * restarted query resumes exactly after the last committed version —
  * the marker-file protocol of `processFeed`, now owned by the
  * streaming checkpoint.
  *
  * Options:
  *   - `path` (or `.load(dir)`): the table directory — REQUIRED
  *   - `readChangeFeed` (default false): emit the CDF shape
  *     (`_change_type`, `_commit_version` appended) via
  *     [[MiniDelta.readCdf]]; otherwise the append-only feed via
  *     [[MiniDelta.readAppends]], which REFUSES data-changing removes
  *   - `skipChangeCommits` (default false): append mode only — drop
  *     UPDATE/DELETE/MERGE commits whole instead of refusing
  *   - `maxVersionsPerTrigger` / `maxBytesPerTrigger`: per-trigger rate
  *     limits in commit / add-byte units (Delta's maxFilesPerTrigger /
  *     maxBytesPerTrigger analogs); both are soft maxima that always
  *     admit at least one commit. `Trigger.AvailableNow` composes: Spark
  *     wraps V1 sources (AvailableNowSourceWrapper), so a drain runs
  *     rate-limited batches up to the trigger-time snapshot, then stops
  *   - `startingVersion` / `startingTimestamp` (exclusive, Delta's):
  *     where a FRESH query begins — a commit version (first ingested),
  *     the literal `latest` (only commits after stream start), or a
  *     timestamp resolving to the first commit at or after it. Absent:
  *     version 0, the whole table as the first batch (Delta's default
  *     initial-snapshot behavior). Restarts ignore these — the
  *     checkpoint owns the position, like real Delta
  *
  * Scale: `getOffset` is one driver metadata probe (latest version);
  * `getBatch` plans a bounded window of commits — file reads stay
  * distributed, deletion vectors apply through the same anti-join as
  * batch reads. Nothing is collected to the driver but paths. */
class GraftDeltaSource extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-delta"

  /** `writeStream.format("graft-delta")` — each micro-batch appends as
    * one versioned commit carrying a Delta `txn` action (appId = the
    * `txnAppId` option, defaulting to the query's checkpoint location):
    * a RETRIED batch whose id is at or below the recorded watermark is
    * a no-op, the real Delta streaming sink's exactly-once contract. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-delta sink supports Append output only, got $outputMode " +
        "(aggregations should flow through foreachBatch)")
    val table = tableOf(parameters)
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(throw new IllegalArgumentException(
        "graft-delta sink needs a stable transaction id: set " +
          ".option(\"txnAppId\", ...) or a checkpointLocation"))
    new GraftDeltaStreamSink(sqlContext.sparkSession, table,
      partitionColumns, appId)
  }

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta requires a table directory: .load(dir) or " +
        ".option(\"path\", dir)"))

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.trim.toBoolean)

  private def declaredOf(spark: SparkSession, table: String): StructType =
    MiniDelta.latestSchema(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"$table is not a MiniDelta table (no committed schema) — " +
          "create it with an append before streaming it"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    val table = tableOf(parameters)
    // surfaced here so a misconfigured reader fails at ANALYSIS, not
    // on the first trigger
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "startingVersion and startingTimestamp are mutually exclusive")
    val base = declaredOf(sqlContext.sparkSession, table)
    val st =
      if (cdfOf(parameters))
        base.add("_change_type", StringType).add("_commit_version", LongType)
      else base
    (shortName(), st)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val table = tableOf(parameters)
    val spark = sqlContext.sparkSession
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "startingVersion and startingTimestamp are mutually exclusive")
    // first version a FRESH query ingests (None = 0, the full table)
    val startFrom: Option[Long] =
      parameters.get("startingVersion").map(_.trim).map {
        case s if s.equalsIgnoreCase("latest") =>
          MiniDelta.currentVersion(spark, table) + 1L
        case s =>
          val v = try s.toLong catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"startingVersion must be a version or 'latest', got '$s'")
          }
          require(v >= 0, s"startingVersion must be >= 0, got $v"); v
      }.orElse(parameters.get("startingTimestamp").map { ts =>
        val micros = org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Literal(ts),
          org.apache.spark.sql.types.TimestampType,
          Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
        require(micros != null,
          s"startingTimestamp '$ts' is not a valid timestamp")
        // first commit at or after the timestamp (Delta's rule);
        // predating the table -> the whole table
        try MiniDelta.versionAtTimestamp(spark, table,
          micros.asInstanceOf[Long] / 1000L - 1L) + 1L
        catch { case _: IllegalArgumentException => 0L }
      })
    new GraftDeltaStreamSource(spark, table,
      cdf = cdfOf(parameters),
      skipChangeCommits =
        parameters.get("skipChangeCommits").exists(_.trim.toBoolean),
      startFrom = startFrom,
      maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger")
        .map(_.trim.toInt).map { n =>
          require(n > 0, "maxVersionsPerTrigger must be positive"); n
        },
      maxBytesPerTrigger = parameters.get("maxBytesPerTrigger")
        .map(_.trim.toLong).map { n =>
          require(n > 0, "maxBytesPerTrigger must be positive (bytes)"); n
        },
      declared = sourceSchema(sqlContext, schema, providerName,
        parameters)._2)
  }
}

private[graft] class GraftDeltaStreamSink(
    spark: SparkSession, table: String, partitionColumns: Seq[String],
    appId: String) extends Sink {

  // watermark cache: the log is read ONCE (first batch after start);
  // afterwards the sink itself is the only writer advancing this
  // appId, so the in-memory value stays authoritative — per-trigger
  // cost stops scaling with checkpoint size
  @volatile private var watermark: Long = Long.MinValue

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // exactly-once: the engine retries addBatch after crashes; the txn
    // watermark in the LOG (not the streaming checkpoint) decides.
    // CAVEAT (same as real Delta idempotent writes): a user-supplied
    // txnAppId outlives a deleted/reset streaming checkpoint, whose
    // batchIds restart at 0 — reuse an appId only with its original
    // checkpoint, or the watermark will no-op the restarted batches.
    if (watermark == Long.MinValue)
      watermark = MiniDelta.lastTxnVersion(spark, table, appId)
    if (batchId <= watermark) return
    // the incoming frame carries a streaming incremental plan that
    // batch writers refuse — re-brand it (same lazy plan)
    val batch = org.apache.spark.sql.graft.StreamingBridge.asBatch(data)
    MiniDelta.append(spark, batch, table, partitionColumns,
      txn = Some((appId, batchId)))
    watermark = batchId
    ()
  }

  override def toString: String = s"GraftDeltaSink[$table]"
}

private[streaming] class GraftDeltaStreamSource(
    spark: SparkSession, table: String, cdf: Boolean,
    skipChangeCommits: Boolean, startFrom: Option[Long],
    maxVersionsPerTrigger: Option[Int],
    maxBytesPerTrigger: Option[Long],
    declared: StructType) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  override def schema: StructType = declared

  // Trigger.AvailableNow: Spark's V1 fallback wrapper snapshots ONE
  // getOffset as the drain target — which is rate-limited here, so a
  // paced source would stop after a single batch. Implementing the
  // interface directly pins the drain target at the TRUE latest
  // version; getOffset then keeps pacing toward it and the query
  // self-terminates once offsets stop advancing.
  @volatile private var availableNowCap: Long = Long.MaxValue
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap =
      math.max(MiniDelta.currentVersion(spark, table), lastPlanned)
    ()
  }

  // per-commit add-byte totals for the byte rate limit; commit files
  // are immutable once named, so the memo never invalidates
  private val commitBytes =
    scala.collection.concurrent.TrieMap.empty[Long, Long]
  private def bytesOf(v: Long): Long =
    commitBytes.getOrElseUpdate(v, MiniDelta.commitAddBytes(spark, table, v))

  /** Version carried by an engine offset: a live LongOffset in-process,
    * or any checkpoint-recovered offset through its JSON long. */
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  // the version BEFORE the first one a fresh query ingests: -1 (full
  // table) unless startingVersion/startingTimestamp moved it. Restarts
  // never consult it — the recovered offset flows through getBatch.
  private val initialBase: Long = startFrom.map(_ - 1L).getOrElse(-1L)

  // highest version already handed to the engine — the base the rate
  // limit advances from. Restart recovery sets it through getBatch
  // (the engine replays the restored batch before the next getOffset),
  // so a capped offset can never fall behind the checkpoint.
  @volatile private var lastPlanned: Long = initialBase

  override def getOffset: Option[Offset] = {
    val latest0 =
      math.min(MiniDelta.currentVersion(spark, table), availableNowCap)
    if (latest0 < 0) return None
    // rate limit (Delta's maxFilesPerTrigger analog, in commit units):
    // each trigger ingests at most n versions past the last batch
    val latest = maxVersionsPerTrigger
      .fold(latest0)(n => math.min(latest0, lastPlanned + n))
    // byte rate limit (Delta's maxBytesPerTrigger, soft-max semantics):
    // admit whole commits while their summed add bytes fit the budget,
    // but ALWAYS at least one — a single commit larger than the budget
    // must still make progress. Per-commit sums are driver-side KB
    // scans of the immutable commit JSONs, memoized for the query's
    // lifetime.
    val capped = maxBytesPerTrigger match {
      case None => latest
      case Some(budget) =>
        var v = lastPlanned
        var bytes = 0L
        var stop = false
        while (!stop && v < latest) {
          val next = bytesOf(v + 1)
          if (v == lastPlanned || bytes + next <= budget) {
            v += 1; bytes += next
          } else stop = true
        }
        v
    }
    val fin = capped.max(lastPlanned) // never step backward
    if (fin < 0) None else Some(LongOffset(fin))
  }

  /** SupportsAdmissionControl form of [[getOffset]] (the engine prefers
    * this once the trait is present — same pacing state, same result;
    * the ReadLimit param is ignored because the limits ride as source
    * options, like FileStreamSource's own maxFilesPerTrigger). */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // (from, to]: a fresh query (start = None) replays from the
    // configured starting point — version 0 by default, so the whole
    // existing table is the first batch, then increments
    val from = start.map(versionOf).getOrElse(initialBase)
    val to = versionOf(end)
    if (to > lastPlanned) lastPlanned = to
    val batch =
      if (cdf) MiniDelta.readCdf(spark, table, from, to)
      else MiniDelta.readAppends(spark, table, from, to, skipChangeCommits)
    // MicroBatchExecution asserts isStreaming on V1 getBatch results —
    // re-brand the (lazy) batch plan as a streaming one
    org.apache.spark.sql.graft.StreamingBridge.asMicroBatch(batch)
  }

  override def stop(): Unit = ()
}
