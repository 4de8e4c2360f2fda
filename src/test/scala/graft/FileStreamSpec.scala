package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MetricsStream

/** The readStream -> windowed agg -> writeStream path over a parquet
  * directory source (how the metrics engine would consume an event log
  * landing in object storage at scale: new files become micro-batches). */
class FileStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet file source streams into per-minute metrics") {
    import spark.implicits._
    val dir = Files.createTempDirectory("filestream").toString
    // land a first file; schema must be provided for streaming sources
    val batch1 = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), 7L, "view", 1.5),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:01:10"), 8L, "view", 2.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    batch1.write.parquet(s"$dir/b1")

    val stream = spark.readStream
      .schema(batch1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val q = MetricsStream.perMinute(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_metrics").start()
    try {
      q.processAllAvailable()
      val w1 = spark.table("file_metrics").orderBy("window_start").collect()
      assert(w1.length == 2)
      // a second file lands -> next micro-batch updates the same windows
      Seq((3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:30"), 9L, "view", 3.5))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val w2 = spark.table("file_metrics").orderBy("window_start").collect()
      assert(w2.length == 2)
      assert(w2(0).getAs[Long]("queries_served") == 2) // 10:00 window grew
    } finally q.stop()
  }

  test("streaming sink: foreachBatch appends micro-batches to a MiniDelta table") {
    import spark.implicits._
    import graft.io.MiniDelta
    val src = Files.createTempDirectory("sinksrc").toString
    val table = Files.createTempDirectory("sinktbl").toString + "/t"
    Seq((1L, "XLON", 10.0), (2L, "XPAR", 11.0))
      .toDF("id", "mic", "price").coalesce(1).write.parquet(s"$src/b1")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$src/b1").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
    // the guarded write path as a streaming sink: each micro-batch is
    // one versioned commit (exactly the reference's append surface, S9)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        MiniDelta.append(spark, batch, table, Seq("mic")); ()
      }
      .start()
    try {
      q.processAllAvailable()
      Seq((3L, "XLON", 12.0)).toDF("id", "mic", "price")
        .coalesce(1).write.parquet(s"$src/b2")
      q.processAllAvailable()
      // two commits in the log, snapshot sees all rows, pruning works
      val versions = MiniDelta.logDF(spark, table)
        .where(col("commitInfo").isNotNull).count()
      assert(versions == 2)
      assert(MiniDelta.snapshotFiles(spark, table).count() >= 2)
      val xlon = MiniDelta.readFiltered(spark, table,
        Seq(Map("mic" -> "XLON")))
      assert(xlon.select("id").collect().map(_.getLong(0)).toSet ==
        Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming exact dedup suppresses duplicates across micro-batches") {
    // the streaming form of Dedup.exact: dropDuplicates on the content
    // fingerprint holds seen-hash state across micro-batches, so a doc
    // repeated in a LATER file emits nothing — the shape an incremental
    // corpus-ingest dedup runs at scale (state is the distinct-hash set,
    // bounded by unique content, not input volume).
    import spark.implicits._
    import graft.llm.TextAnalysis
    val dir = Files.createTempDirectory("streamdedup").toString
    Seq((1L, "aaa bbb"), (2L, "ccc ddd")).toDF("doc_id", "text")
      .write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .dropDuplicates("fp")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup").start()
    try {
      q.processAllAvailable()
      assert(spark.table("stream_dedup").count() == 2)
      // duplicates of batch-1 content plus one new doc land later
      Seq((3L, "aaa bbb"), (4L, "AAA   bbb!"), (5L, "eee fff"))
        .toDF("doc_id", "text").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val out = spark.table("stream_dedup").collect()
      assert(out.length == 3) // 3 and 4 (normalized dup of 1) suppressed
      val batchFps = Seq("aaa bbb", "ccc ddd", "eee fff").toDF("text")
        .select(TextAnalysis.fingerprint(col("text"))).as[String]
        .collect().toSet
      assert(out.map(_.getString(1)).toSet == batchFps)
    } finally q.stop()
  }

  test("streamed MiniDelta table equals the batch-written table exactly") {
    // T4 parity gate: the same rows written (a) as streaming micro-batch
    // commits through foreachBatch and (b) as one batch append must
    // produce tables with identical CONTENT under the log-driven reader
    // — the sink is not a lossy approximation of the batch path.
    import spark.implicits._
    import graft.io.MiniDelta
    val src = Files.createTempDirectory("eqsrc").toString
    val streamed = Files.createTempDirectory("eqstream").toString + "/t"
    val batched = Files.createTempDirectory("eqbatch").toString + "/t"
    val rows = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) "XLON" else "XPAR", i * 1.25))
    // three source files -> three micro-batches
    rows.grouped(14).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("id", "mic", "price").coalesce(1)
        .write.parquet(s"$src/b$i")
    }
    val schema = spark.read.parquet(s"$src/b0").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        MiniDelta.append(spark, batch, streamed, Seq("mic")); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    MiniDelta.append(spark, rows.toDF("id", "mic", "price"), batched,
      Seq("mic"))
    def content(t: String) =
      MiniDelta.readFiltered(spark, t, Seq.empty)
        .select("id", "mic", "price")
        .orderBy("id").collect().map(_.toSeq).toSeq
    assert(content(streamed) == content(batched))
    // and both prune identically
    def pruned(t: String) =
      MiniDelta.readFiltered(spark, t, Seq(Map("mic" -> "XLON")))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned(streamed) == pruned(batched))
    // micro-batch granularity shows only in the log (3 commits vs 1)
    assert(MiniDelta.logDF(spark, streamed)
      .where(col("commitInfo").isNotNull).count() == 3)
    assert(MiniDelta.logDF(spark, batched)
      .where(col("commitInfo").isNotNull).count() == 1)
  }

  test("processCdf streams row-level changes: drained feed == batch readCdf") {
    // the streaming CDF source: an append + UPDATE + DELETE lifecycle
    // drained one commit per micro-batch must reproduce the batch
    // readCdf feed exactly — including the pure-DELETE commit, which
    // carries only dataChange REMOVES and must still wake the handler
    import spark.implicits._
    import graft.io.MiniDelta
    val t = Files.createTempDirectory("cdfstream").toString + "/t"
    val cp = Files.createTempDirectory("cdfcp").toString
    MiniDelta.append(spark,
      (1L to 9L).map(i => (i, s"v$i")).toDF("id", "payload"), t, Seq.empty)
    MiniDelta.update(spark, t, col("id") <= 3,
      Map("payload" -> lit("edited")), Seq.empty)
    MiniDelta.delete(spark, t, col("id") >= 8, Seq.empty)
    MiniDelta.compact(spark, t, Seq.empty) // dataChange=false: no batch
    val drained = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[(Long, String, String, Long)])]
    val last = MiniDelta.processCdf(spark, t, cp) { (batch, v) =>
      drained += v -> batch
        .select("id", "payload", "_change_type", "_commit_version")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSet
    }
    assert(last == 3L)
    // one batch per DATA commit, in version order; OPTIMIZE delivers none
    assert(drained.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(drained(0)._2.forall(_._3 == "insert"))
    assert(drained(1)._2.map(_._3) == Set("update_preimage", "update_postimage"))
    assert(drained(2)._2 == Set((8L, "v8", "delete", 2L), (9L, "v9", "delete", 2L)))
    // the union of the drained micro-batches IS the batch feed
    val batchFeed = MiniDelta.readCdf(spark, t, fromVersion = -1)
      .select("id", "payload", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    assert(drained.flatMap(_._2).toSet == batchFeed)
    // resume contract: nothing re-delivers
    MiniDelta.processCdf(spark, t, cp) { (_, _) => fail("redelivery") }
  }

  test("readStream.format(graft-delta) CDF == batch readCdf; restart resumes") {
    // the engine-managed streaming source (VERDICT r6 #6): the same
    // append + UPDATE + DELETE lifecycle as processCdf, drained through
    // spark.readStream with the engine's own offset/commit checkpoint
    import spark.implicits._
    import graft.io.MiniDelta
    val t = Files.createTempDirectory("gdsrc").toString + "/t"
    val cp = Files.createTempDirectory("gdcp").toString
    MiniDelta.append(spark,
      (1L to 9L).map(i => (i, s"v$i")).toDF("id", "payload"), t, Seq.empty)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "payload", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    val stream = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").load(t)
    assert(stream.columns.toSeq ==
      Seq("id", "payload", "_change_type", "_commit_version"))
    // foreachBatch sink: the one test sink that also supports
    // checkpoint RECOVERY (memory sink refuses restarts)
    val buf = scala.collection.mutable.Set
      .empty[(Long, String, String, Long)]
    def sinkTo(acc: scala.collection.mutable.Set[(Long, String, String, Long)])
        (b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      acc ++= shape(b); ()
    }
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch(sinkTo(buf) _).start()
    try {
      q.processAllAvailable()
      MiniDelta.update(spark, t, col("id") <= 3,
        Map("payload" -> lit("edited")), Seq.empty)
      q.processAllAvailable()
      MiniDelta.delete(spark, t, col("id") >= 8, Seq.empty)
      MiniDelta.compact(spark, t, Seq.empty) // dataChange=false: no rows
      q.processAllAvailable()
      assert(buf.toSet ==
        shape(MiniDelta.readCdf(spark, t, fromVersion = -1)))
    } finally q.stop()
    // restart from the same checkpoint: ONLY the new commit delivers
    MiniDelta.append(spark, Seq((100L, "x")).toDF("id", "payload"),
      t, Seq.empty)
    val buf2 = scala.collection.mutable.Set
      .empty[(Long, String, String, Long)]
    val q2 = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").load(t)
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch(sinkTo(buf2) _).start()
    try {
      q2.processAllAvailable()
      assert(buf2.toSet == Set((100L, "x", "insert", 4L)))
    } finally q2.stop()
  }

  test("graft-delta CDF stream drains a MAPPED CDF table with real cdc files") {
    // the late-r13 composition: the table is column-mapped AND CDF —
    // DML commits carry real _change_data files under PHYSICAL names,
    // and the streaming source's readCdf relabels them to logical.
    import spark.implicits._
    import graft.io.MiniDelta
    import org.apache.spark.sql.types._
    val t = Files.createTempDirectory("gdmap").toString + "/t"
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("payload", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name",
        "delta.enableChangeDataFeed" -> "true"))
    MiniDelta.append(spark,
      (1L to 4L).map(i => (i, s"v$i")).toDF("id", "payload"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.update(spark, t, col("id") === 2L,
      Map("payload" -> lit("edited")), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.delete(spark, t, col("id") === 4L, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "payload", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    val got = scala.collection.mutable.Set
      .empty[(Long, String, String, Long)]
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true").load(t)
      .writeStream.outputMode("append")
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        got ++= shape(b); ()
      }).start()
    try {
      q.processAllAvailable()
      assert(got.toSet == shape(MiniDelta.readCdf(spark, t, -1L)))
      assert(got.exists(_._3 == "update_preimage"))
      assert(got.exists(_._3 == "delete"))
    } finally q.stop()
  }

  test("graft-delta append mode refuses changed data; skipChangeCommits drops the commit whole") {
    import spark.implicits._
    import graft.io.MiniDelta
    val t = Files.createTempDirectory("gdapp").toString + "/t"
    MiniDelta.append(spark,
      (1L to 5L).map(i => (i, s"v$i")).toDF("id", "payload"), t, Seq.empty)
    MiniDelta.update(spark, t, col("id") === 1L,
      Map("payload" -> lit("edited")), Seq.empty)          // v1: changes data
    MiniDelta.append(spark, Seq((6L, "v6")).toDF("id", "payload"),
      t, Seq.empty)                                        // v2: pure append
    // default contract (same as Delta's streaming source): an
    // UPDATE/DELETE/MERGE commit in the window is an ERROR — its adds
    // alone would misstate the change
    val q = spark.readStream.format("graft-delta").load(t)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("gdappcp1").toString)
      .format("memory").queryName("gd_app_fail").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(err.getMessage.contains("not append-only") ||
      Option(err.getCause).exists(_.getMessage.contains("not append-only")))
    // skipChangeCommits: the UPDATE commit is dropped WHOLE — v0 and v2
    // rows flow, v1's post-image rows never appear
    val q2 = spark.readStream.format("graft-delta")
      .option("skipChangeCommits", "true").load(t)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("gdappcp2").toString)
      .format("memory").queryName("gd_app_skip").start()
    try {
      q2.processAllAvailable()
      val got = spark.table("gd_app_skip")
        .select("id", "payload").as[(Long, String)].collect().toSet
      assert(got == ((1L to 5L).map(i => (i, s"v$i")).toSet + ((6L, "v6"))))
    } finally q2.stop()
  }

  test("writeStream.format(graft-delta) sinks micro-batches as txn-stamped commits") {
    import spark.implicits._
    import graft.io.MiniDelta
    val src = Files.createTempDirectory("gdsinksrc").toString
    val t = Files.createTempDirectory("gdsinktbl").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/b1")
    val q = spark.readStream
      .schema(spark.read.parquet(s"$src/b1").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
      .writeStream.format("graft-delta")
      .option("path", t)
      .option("txnAppId", "sink-spec")
      .option("checkpointLocation",
        Files.createTempDirectory("gdsinkcp").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 2)
      Seq((3L, "c")).toDF("id", "v").coalesce(1).write.parquet(s"$src/b2")
      q.processAllAvailable()
      assert(MiniDelta.readFiltered(spark, t, Seq.empty)
        .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
    // the commits carry the Delta txn watermark
    assert(MiniDelta.lastTxnVersion(spark, t, "sink-spec") == 1L)
  }

  test("graft-delta sink: a retried micro-batch is a no-op (txn exactly-once)") {
    import spark.implicits._
    import graft.io.MiniDelta
    val t = Files.createTempDirectory("gdsinkretry").toString + "/t"
    val sink = new graft.streaming.GraftDeltaStreamSink(
      spark, t, Seq.empty, "app-1")
    sink.addBatch(0L, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 2)
    // the engine re-delivers batch 0 after a crash-before-commit:
    // the log's txn watermark, not the streaming checkpoint, says no
    sink.addBatch(0L, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 2)
    sink.addBatch(1L, Seq((3L, "c")).toDF("id", "v"))
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 3)
    assert(MiniDelta.lastTxnVersion(spark, t, "app-1") == 1L)
    assert(MiniDelta.lastTxnVersion(spark, t, "other-app") == -1L)
  }

  test("graft-delta maxVersionsPerTrigger paces ingestion one commit at a time") {
    import spark.implicits._
    import graft.io.MiniDelta
    val t = Files.createTempDirectory("gdrate").toString + "/t"
    (0 until 3).foreach { i =>
      MiniDelta.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "payload"), t, Seq.empty)
    }
    val versionsPerBatch =
      scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("gdratecp").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        versionsPerBatch += b.select("_commit_version")
          .collect().map(_.getLong(0)).toSet
        ()
      }.start()
    try {
      q.processAllAvailable()
      // three commits, paced one per micro-batch, in order
      assert(versionsPerBatch.toSeq == Seq(Set(0L), Set(1L), Set(2L)))
    } finally q.stop()
  }

  test("graft-delta maxBytesPerTrigger paces by commit add-bytes") {
    import spark.implicits._
    import graft.io.MiniDelta
    val t = Files.createTempDirectory("gdbytes").toString + "/t"
    (0 until 4).foreach { i =>
      MiniDelta.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "payload"), t, Seq.empty)
    }
    // budget = one commit's bytes + 1: each trigger admits exactly one
    // commit (admitting a second would exceed), proving the soft-max
    // walks commit byte sums, not commit counts
    val oneCommit = MiniDelta.commitAddBytes(spark, t, 1L)
    assert(oneCommit > 0)
    val versionsPerBatch =
      scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("maxBytesPerTrigger", (oneCommit + 1).toString).load(t)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("gdbytescp").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        versionsPerBatch += b.select("_commit_version")
          .collect().map(_.getLong(0)).toSet
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(versionsPerBatch.toSeq ==
        Seq(Set(0L), Set(1L), Set(2L), Set(3L)), versionsPerBatch.toSeq)
    } finally q.stop()
  }

  test("graft-delta startingVersion/startingTimestamp position a fresh query") {
    import spark.implicits._
    import graft.io.MiniDelta
    val t = Files.createTempDirectory("gdstart").toString + "/t"
    (0 until 3).foreach { i =>
      MiniDelta.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "payload"), t, Seq.empty)
    }
    def drainIds(opts: Map[String, String]): Seq[Long] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val r = spark.readStream.format("graft-delta")
      opts.foreach { case (k, v) => r.option(k, v) }
      val q = r.load(t).writeStream.outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("gdstartcp").toString)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.select("id").collect().map(_.getLong(0)); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      got.toSeq.sorted
    }
    // startingVersion=1 skips v0's rows
    assert(drainIds(Map("startingVersion" -> "1")) == Seq(1L, 2L))
    // a timestamp predating the table replays everything
    assert(drainIds(Map("startingTimestamp" -> "1970-01-02 00:00:00")) ==
      Seq(0L, 1L, 2L))
    // 'latest' sees only commits made after the stream starts
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-delta")
      .option("startingVersion", "latest").load(t)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("gdlatestcp").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.select("id").collect().map(_.getLong(0)); ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.isEmpty)
      MiniDelta.append(spark, Seq((9L, "late")).toDF("id", "payload"),
        t, Seq.empty)
      q.processAllAvailable()
      assert(got.toSeq == Seq(9L))
    } finally q.stop()
    // the two options refuse together, at analysis (load), not on the
    // first trigger
    val e = intercept[Exception](
      spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("startingTimestamp", "1970-01-01 00:00:00")
        .load(t))
    assert(e.getMessage.contains("mutually exclusive"))
  }

  test("graft-delta drains rate-limited under Trigger.AvailableNow then stops") {
    import spark.implicits._
    import graft.io.MiniDelta
    val t = Files.createTempDirectory("gdavail").toString + "/t"
    (0 until 3).foreach { i =>
      MiniDelta.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "payload"), t, Seq.empty)
    }
    val versionsPerBatch =
      scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-delta")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("gdavailcp").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        versionsPerBatch += b.select("_commit_version")
          .collect().map(_.getLong(0)).toSet
        ()
      }.start()
    try {
      // AvailableNow terminates on its own once the snapshot drains —
      // three paced batches, then the query ends without stop()
      assert(q.awaitTermination(120000),
        "AvailableNow query did not self-terminate")
      assert(versionsPerBatch.toSeq == Seq(Set(0L), Set(1L), Set(2L)),
        versionsPerBatch.toSeq)
    } finally if (q.isActive) q.stop()
  }

  test("graft-delta stream crossing REPLACE COLUMNS refuses loudly " +
      "(r19): a mid-stream column DROP never silently null-fills") {
    import spark.implicits._
    import graft.io.MiniDelta
    import org.apache.spark.sql.types._
    val t = Files.createTempDirectory("gdrepl").toString + "/t"
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("note", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "note"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val got = scala.collection.mutable.Set.empty[Long]
    val q = spark.readStream.format("graft-delta").load(t)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("gdreplcp").toString)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        got ++= b.select("id").collect().map(_.getLong(0)); ()
      }).start()
    try {
      q.processAllAvailable()
      assert(got.toSet == Set(1L, 2L))
      // mid-stream REPLACE COLUMNS drops 'note' — the next poll's
      // window crosses the boundary and must refuse, not render the
      // old rows lossily under the new schema
      MiniDelta.replaceColumns(spark, t, Seq(
        StructField("id", LongType), StructField("tag", StringType)))
      MiniDelta.invalidateSnapshot(t)
      MiniDelta.append(spark, Seq((3L, "t")).toDF("id", "tag"),
        t, Seq.empty)
      MiniDelta.invalidateSnapshot(t)
      val err = intercept[
          org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def hasDrop(e: Throwable): Boolean = e != null &&
        (Option(e.getMessage).exists(_.contains("DROPPED")) ||
          hasDrop(e.getCause))
      assert(hasDrop(err), err.getMessage)
    } finally if (q.isActive) q.stop()
    // a FRESH stream from the post-replace offset drains cleanly —
    // the refusal is about the boundary, not the table
    val got2 = scala.collection.mutable.Set.empty[Long]
    val q2 = spark.readStream.format("graft-delta")
      .option("startingVersion", "3").load(t)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("gdreplcp2").toString)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
        got2 ++= b.select("id").collect().map(_.getLong(0)); ()
      }).start()
    try {
      q2.processAllAvailable()
      assert(got2.toSet == Set(3L), got2.toString)
    } finally q2.stop()
  }
}
