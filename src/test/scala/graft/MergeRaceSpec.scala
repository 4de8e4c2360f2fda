package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Keyed-MERGE conflict RESOLUTION (round 15): a lost race re-examines
  * the winners and rebases when every winner is provably disjoint —
  * for a merge, when no concurrent dataChange add can hold a row whose
  * key falls in the source's key range (the same file-level screen
  * that scopes discovery). May-match adds, removes of the merge's
  * inputs, metadata changes, and identity tables still conflict. */
class MergeRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("mergerace").toString + "/t"

  private def rows(ks: (Long, String)*) = ks.toSeq.toDF("id", "v")

  private def fireOnce(f: => Unit): Unit = {
    MiniDelta.beforeDmlCommitHook = () => {
      MiniDelta.beforeDmlCommitHook = () => ()
      f
    }
  }

  test("keyed MERGE rebases past a concurrent add outside its key range") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a", 2L -> "b", 3L -> "c"), t,
      Seq.empty)
    // source keys span [2, 10]; the concurrent add's id stats say 100
    fireOnce {
      MiniDelta.append(spark, rows(100L -> "race"), t, Seq.empty); ()
    }
    try {
      val v = MiniDelta.merge(spark, t,
        rows(2L -> "B", 10L -> "new"), Seq("id"), Seq.empty)
      assert(v == MiniDelta.latestVersion(spark, t),
        "the rebased MERGE must land after the concurrent append")
    } finally MiniDelta.beforeDmlCommitHook = () => ()
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .as[(Long, String)].collect().toSet
    // both effects present: the upsert applied AND the race survived
    assert(out == Set(1L -> "a", 2L -> "B", 3L -> "c", 10L -> "new",
      100L -> "race"), out)
  }

  test("keyed MERGE conflicts on a concurrent add inside its key range") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a", 2L -> "b"), t, Seq.empty)
    // key 5 sits inside the source's [2, 10] range: the winner MAY
    // hold a row this merge should have matched (or its insert of 5
    // would collide) — resolution must refuse
    fireOnce { MiniDelta.append(spark, rows(5L -> "race"), t, Seq.empty); () }
    try intercept[MiniDelta.ConcurrentCommitException] {
      MiniDelta.merge(spark, t, rows(2L -> "B", 10L -> "new"),
        Seq("id"), Seq.empty)
    } finally MiniDelta.beforeDmlCommitHook = () => ()
  }

  test("keyed merge-DELETE rebases; by-source sync-delete refuses any add") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a", 2L -> "b", 3L -> "c"), t,
      Seq.empty)
    fireOnce {
      MiniDelta.append(spark, rows(100L -> "race"), t, Seq.empty); ()
    }
    try MiniDelta.mergeDelete(spark, t, rows(2L -> "x"), Seq("id"),
      Seq.empty)
    finally MiniDelta.beforeDmlCommitHook = () => ()
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet == Set(1L, 3L, 100L))
    // NOT MATCHED BY SOURCE reads the complement: the concurrent add's
    // rows (key 200, absent from the source) SHOULD have been swept —
    // any dataChange add conflicts, whatever its range
    fireOnce {
      MiniDelta.append(spark, rows(200L -> "race2"), t, Seq.empty); ()
    }
    try intercept[MiniDelta.ConcurrentCommitException] {
      // the sweep deletes 3 and 100 (absent from the source), so a
      // commit IS attempted — and the winner's add refuses it
      MiniDelta.mergeDelete(spark, t, rows(1L -> "a"), Seq("id"),
        Seq.empty, bySource = true)
    } finally MiniDelta.beforeDmlCommitHook = () => ()
  }

  test("general MERGE clauses rebase past a disjoint add") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a", 2L -> "b"), t, Seq.empty)
    fireOnce {
      MiniDelta.append(spark, rows(100L -> "race"), t, Seq.empty); ()
    }
    try MiniDelta.mergeClauses(spark, t, rows(2L -> "B", 10L -> "new"),
      Seq("id"),
      matched = Seq(MiniDelta.MergeMatchedClause(None,
        Some(Map("v" -> col("`__src_v`"))))),
      notMatched = Seq(MiniDelta.MergeInsertClause(None,
        Map("id" -> col("id"), "v" -> col("v")))),
      bySource = Nil, partitionBy = Seq.empty)
    finally MiniDelta.beforeDmlCommitHook = () => ()
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .as[(Long, String)].collect().toSet
    assert(out == Set(1L -> "a", 2L -> "B", 10L -> "new",
      100L -> "race"), out)
  }

  test("DV-form merge rebases past a disjoint add; mask races conflict") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, rows(1L -> "a").schema,
      properties = Map("delta.enableDeletionVectors" -> "true"))
    MiniDelta.append(spark, rows(1L -> "a", 2L -> "b"), t, Seq.empty)
    fireOnce {
      MiniDelta.append(spark, rows(100L -> "race"), t, Seq.empty); ()
    }
    try MiniDelta.merge(spark, t, rows(2L -> "B", 10L -> "new"),
      Seq("id"), Seq.empty)
    finally MiniDelta.beforeDmlCommitHook = () => ()
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .as[(Long, String)].collect().toSet
    assert(out == Set(1L -> "a", 2L -> "B", 10L -> "new",
      100L -> "race"), out)
    // conflict side: a concurrent DELETE swaps the mask of the very
    // file this merge masks — its remove of our input must refuse
    MiniDelta.invalidateSnapshot(t)
    fireOnce { MiniDelta.delete(spark, t, col("id") === 10L, Seq.empty); () }
    try intercept[MiniDelta.ConcurrentCommitException] {
      MiniDelta.merge(spark, t, rows(10L -> "X"), Seq("id"), Seq.empty)
    } finally MiniDelta.beforeDmlCommitHook = () => ()
  }

  test("identity-table MERGE stays pinned: any concurrent commit conflicts") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    val idm = new MetadataBuilder()
      .putLong("delta.identity.start", 1L)
      .putLong("delta.identity.step", 1L).build()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("sk", LongType, nullable = true, idm),
      StructField("id", LongType), StructField("v", StringType))))
    MiniDelta.append(spark, rows(1L -> "a"), t, Seq.empty)
    // even a far-away key range must conflict: the winner advanced the
    // high-water mark this merge's assignment was computed against
    fireOnce {
      MiniDelta.append(spark, rows(100L -> "race"), t, Seq.empty); ()
    }
    try intercept[MiniDelta.ConcurrentCommitException] {
      MiniDelta.merge(spark, t, rows(2L -> "new"), Seq("id"), Seq.empty)
    } finally MiniDelta.beforeDmlCommitHook = () => ()
  }
}
