package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** `delta.isolationLevel` (r16 — the last named knob of Delta's
  * concurrency surface): WriteSerializable (the default) lets the
  * conflict resolver rebase a predicate DML past a provably-disjoint
  * concurrent add — the DML-before-winner reordering; `Serializable`
  * forbids that reordering, so EVERY intervening dataChange add
  * conflicts regardless of the stats screen. Plus the rebase-cost pin:
  * each winner commit is driver-read for screening exactly ONCE across
  * the whole rebase sequence (attempt N+1 starts past attempt N's
  * screen), not once per attempt. */
class IsolationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("isolation").toString + "/t"

  private def rows(ks: (Long, String)*) = ks.toSeq.toDF("id", "v")

  private def fireOnce(f: => Unit): Unit = {
    MiniDelta.beforeDmlCommitHook = () => {
      MiniDelta.beforeDmlCommitHook = () => ()
      f
    }
  }

  test("WriteSerializable (default) rebases a predicate DELETE past a " +
      "disjoint add") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a", 2L -> "b"), t, Seq.empty)
    fireOnce { MiniDelta.append(spark, rows(100L -> "race"), t,
      Seq.empty); () }
    try {
      MiniDelta.delete(spark, t, col("id") === 1L, Seq.empty)
      ()
    } finally MiniDelta.beforeDmlCommitHook = () => ()
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .as[(Long, String)].collect().toSet
    assert(out == Set(2L -> "b", 100L -> "race"), out)
  }

  test("Serializable conflicts on the SAME disjoint add the default " +
      "level rebases past") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a", 2L -> "b"), t, Seq.empty)
    MiniDelta.setTableProperties(spark, t,
      Map("delta.isolationLevel" -> "Serializable"))
    MiniDelta.invalidateSnapshot(t)
    fireOnce { MiniDelta.append(spark, rows(100L -> "race"), t,
      Seq.empty); () }
    try intercept[MiniDelta.ConcurrentCommitException] {
      MiniDelta.delete(spark, t, col("id") === 1L, Seq.empty)
    } finally MiniDelta.beforeDmlCommitHook = () => ()
    // the DELETE never landed: both rows survive beside the winner
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .as[(Long, String)].collect().toSet
    assert(out == Set(1L -> "a", 2L -> "b", 100L -> "race"), out)
  }

  test("unknown isolation levels refuse at SET TBLPROPERTIES") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a"), t, Seq.empty)
    val e = intercept[IllegalArgumentException](
      MiniDelta.setTableProperties(spark, t,
        Map("delta.isolationLevel" -> "Snapshot")))
    assert(e.getMessage.contains("WriteSerializable"), e.getMessage)
    // both legal spellings land (case-insensitive, Delta's)
    MiniDelta.setTableProperties(spark, t,
      Map("delta.isolationLevel" -> "WriteSerializable"))
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.setTableProperties(spark, t,
      Map("delta.isolationLevel" -> "Serializable"))
  }

  test("unknown isolation levels refuse at CREATE and REPLACE TABLE " +
      "too (the silent-WriteSerializable-downgrade guard)") {
    // every property-accepting entry point validates (r17): a typo'd
    // level declared at CREATE must refuse loudly, never run silently
    // as WriteSerializable in the conflict resolver
    import org.apache.spark.sql.types._
    val t = freshTable()
    val sch = StructType(Seq(StructField("id", LongType)))
    val e = intercept[IllegalArgumentException](
      MiniDelta.createTable(spark, t, sch,
        properties = Map("delta.isolationLevel" -> "Snapshot")))
    assert(e.getMessage.contains("WriteSerializable"), e.getMessage)
    MiniDelta.createTable(spark, t, sch,
      properties = Map("delta.isolationLevel" -> "Serializable"))
    val e2 = intercept[IllegalArgumentException](
      MiniDelta.replaceTable(spark, t, sch,
        properties = Map("delta.isolationLevel" -> "REPEATABLE_READ")))
    assert(e2.getMessage.contains("WriteSerializable"), e2.getMessage)
  }

  test("each winner commit is screened exactly once across two rebase " +
      "attempts") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a", 2L -> "b"), t, Seq.empty)
    // winner #1 lands before the DELETE's first commit attempt;
    // winner #2 lands AFTER the first screen passes, forcing a second
    // attempt + second screen
    fireOnce { MiniDelta.append(spark, rows(100L -> "w1"), t,
      Seq.empty); () }
    val prevRebase = MiniDelta.onRebaseScreenHook
    MiniDelta.onRebaseScreenHook = () => {
      MiniDelta.onRebaseScreenHook = prevRebase // fire once
      MiniDelta.append(spark, rows(200L -> "w2"), t, Seq.empty)
      ()
    }
    try {
      MiniDelta.delete(spark, t, col("id") === 1L, Seq.empty)
      ()
    } finally {
      MiniDelta.beforeDmlCommitHook = () => ()
      MiniDelta.onRebaseScreenHook = prevRebase
    }
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .as[(Long, String)].collect().toSet
    assert(out == Set(2L -> "b", 100L -> "w1", 200L -> "w2"), out)
    import scala.jdk.CollectionConverters._
    val screened = MiniDelta.winnerCommitsScreened.asScala.toSeq
      .filter(_.startsWith(s"$t@"))
    assert(screened == screened.distinct,
      s"a winner was screened twice: $screened")
    assert(screened.map(_.substring(t.length + 1).toLong).sorted ==
      Seq(1L, 2L),
      s"expected exactly winners v1 and v2 screened, got $screened")
  }
}
