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
}
