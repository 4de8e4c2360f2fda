package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Log-driven snapshot + pruning (S4/S5/P5) and the guarded write path
  * (S9/P9) over a scratch table in /tmp. */
class MiniDeltaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("minidelta").toString + "/t"

  private def sample(year: String, n: Int) =
    (1 to n).map(i => (i.toLong, year, s"v$i")).toDF("id", "year", "payload")

  test("append writes versioned commits; snapshot sees all live files") {
    val t = freshTable()
    assert(MiniDelta.append(spark, sample("2023", 3), t, Seq("year")) == 0L)
    assert(MiniDelta.append(spark, sample("2024", 2), t, Seq("year")) == 1L)
    val snap = MiniDelta.snapshotFiles(spark, t)
    assert(snap.count() > 0)
    // every file carries its Hive partition value in the log metadata
    val years = snap.select(element_at(col("partitionValues"), "year"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(years == Set("2023", "2024"))
  }

  test("partition filters resolve to the exact file subset, metadata-only") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 3), t, Seq("year"))
    MiniDelta.append(spark, sample("2024", 2), t, Seq("year"))
    val snap = MiniDelta.snapshotFiles(spark, t)
    val pruned = MiniDelta.filesForFilters(snap, Seq(Map("year" -> "2023")))
    assert(pruned.count() < snap.count())
    assert(pruned.select(element_at(col("partitionValues"), "year"))
      .distinct().collect().map(_.getString(0)).toSet == Set("2023"))
    // empty filters / empty maps = allow all (P7)
    assert(MiniDelta.filesForFilters(snap, Seq.empty).count() == snap.count())
    assert(MiniDelta.filesForFilters(snap, Seq(Map.empty)).count() ==
      snap.count())
  }

  test("readFiltered scans only allowed rows (authorize-then-fetch)") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 3), t, Seq("year"))
    MiniDelta.append(spark, sample("2024", 2), t, Seq("year"))
    val got = MiniDelta.readFiltered(spark, t, Seq(Map("year" -> "2023")))
    assert(got.count() == 3)
    // denied partition never read: XPAR analogue
    assert(MiniDelta.readFiltered(spark, t, Seq(Map("year" -> "1999")))
      .count() == 0)
  }

  test("read-only gate rejects writes (405 semantics)") {
    val t = freshTable()
    intercept[MiniDelta.ReadOnlyTableException] {
      MiniDelta.append(spark, sample("2023", 1), t, Seq("year"),
        readOnly = true)
    }
  }

  test("compaction rewrites the snapshot; data identical; removes replayed") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 3), t, Seq("year"))
    MiniDelta.append(spark, sample("2023", 2), t, Seq("year"))
    MiniDelta.append(spark, sample("2024", 2), t, Seq("year"))
    val beforeFiles = MiniDelta.snapshotFiles(spark, t).count()
    val beforeData = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id", "year").collect().map(_.toSeq).toSeq
    val v = MiniDelta.compact(spark, t, Seq("year"))
    assert(v == 3L)
    val afterSnap = MiniDelta.snapshotFiles(spark, t)
    assert(afterSnap.count() == 2) // one file per year partition
    assert(afterSnap.count() < beforeFiles)
    val afterData = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id", "year").collect().map(_.toSeq).toSeq
    assert(afterData == beforeData)
    // pruning still resolves exactly after compaction
    assert(MiniDelta.readFiltered(spark, t, Seq(Map("year" -> "2023")))
      .count() == 5)
  }

  test("time travel: snapshotFilesAt replays only up to a version") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 3), t, Seq("year"))
    MiniDelta.append(spark, sample("2024", 2), t, Seq("year"))
    MiniDelta.compact(spark, t, Seq("year"))
    val v0 = MiniDelta.snapshotFilesAt(spark, t, 0)
    val v1 = MiniDelta.snapshotFilesAt(spark, t, 1)
    val v2 = MiniDelta.snapshotFilesAt(spark, t, 2)
    assert(v0.select(element_at(col("partitionValues"), "year")).distinct()
      .collect().map(_.getString(0)).toSet == Set("2023"))
    assert(v1.count() > v0.count())
    assert(v2.count() == 2) // post-compaction: one file per partition
    // v1's files are disjoint from v2's rewritten files for old data
    assert(v2.join(v1, Seq("path"), "left_semi").count() == 0)
  }

  test("vacuum deletes only unreferenced files; reads stay correct") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 3), t, Seq("year"))
    MiniDelta.append(spark, sample("2024", 2), t, Seq("year"))
    MiniDelta.compact(spark, t, Seq("year"))
    val before = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id", "year").collect().map(_.toSeq).toSeq
    val deleted = MiniDelta.vacuum(spark, t)
    assert(deleted.nonEmpty) // the pre-compaction files
    val after = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id", "year").collect().map(_.toSeq).toSeq
    assert(after == before)
    // idempotent
    assert(MiniDelta.vacuum(spark, t).isEmpty)
    // read-only gate applies
    intercept[MiniDelta.ReadOnlyTableException] {
      MiniDelta.vacuum(spark, t, readOnly = true)
    }
  }

  test("the log itself reads as data (S5 passthrough)") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 2), t, Seq("year"))
    val log = MiniDelta.logDF(spark, t)
    assert(log.where(col("add").isNotNull).count() > 0)
    assert(log.where(col("commitInfo").isNotNull).count() == 1)
  }
}
