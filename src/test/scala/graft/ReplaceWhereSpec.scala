package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.plans.GraftSqlTables

/** Delta 1.1's ARBITRARY-predicate replaceWhere: `INSERT INTO t
  * REPLACE WHERE cond query` replaces exactly the rows matching the
  * condition — a DELETE fused with the insert in one commit, with the
  * scope guard (incoming rows must satisfy the condition), CDF
  * delete+insert images, and the keyed conflict-resolution screen. */
class ReplaceWhereSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("replwhere").toString + "/t"

  private def rows(ks: (Long, String)*) = ks.toSeq.toDF("id", "v")

  test("predicate replaceWhere rewrites partially-matching files") {
    val t = freshTable()
    // one file holding ids 1..6: the replace must keep 1..3 from it
    MiniDelta.append(spark,
      rows(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e",
        6L -> "f").repartition(1), t, Seq.empty)
    val v = MiniDelta.overwrite(spark,
      rows(10L -> "X", 11L -> "Y"), t, Seq.empty,
      replaceWhereCond = Some(col("id") >= 4L))
    assert(v == MiniDelta.latestVersion(spark, t))
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .as[(Long, String)].collect().toSet
    assert(out == Set(1L -> "a", 2L -> "b", 3L -> "c", 10L -> "X",
      11L -> "Y"), out)
    // no-match scope: replaces nothing, inserts still land
    MiniDelta.overwrite(spark, rows(100L -> "Z"), t, Seq.empty,
      replaceWhereCond = Some(col("id") >= 100L))
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 6)
  }

  test("scope guard: incoming rows outside the condition refuse") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a"), t, Seq.empty)
    val e = intercept[IllegalArgumentException] {
      MiniDelta.overwrite(spark, rows(3L -> "out"), t, Seq.empty,
        replaceWhereCond = Some(col("id") >= 10L))
    }
    assert(e.getMessage.contains("outside the replaced scope"))
    // the two forms are mutually exclusive
    intercept[IllegalArgumentException] {
      MiniDelta.overwrite(spark, rows(10L -> "x"), t, Seq.empty,
        replaceWhere = Seq(Map("id" -> "10")),
        replaceWhereCond = Some(col("id") >= 10L))
    }
  }

  test("CDF feed carries the replaced rows as deletes + the new as inserts") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, rows(1L -> "a").schema,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    MiniDelta.append(spark, rows(1L -> "a", 5L -> "e"), t, Seq.empty)
    val v = MiniDelta.overwrite(spark, rows(9L -> "X"), t, Seq.empty,
      replaceWhereCond = Some(col("id") >= 5L))
    val feed = MiniDelta.readCdf(spark, t, v - 1, v)
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(feed == Set(5L -> "delete", 9L -> "insert"), feed)
  }

  test("resolution: a concurrent add outside the scope rebases") {
    val t = freshTable()
    MiniDelta.append(spark, rows(1L -> "a", 8L -> "h"), t, Seq.empty)
    MiniDelta.beforeDmlCommitHook = () => {
      MiniDelta.beforeDmlCommitHook = () => ()
      MiniDelta.append(spark, rows(100L -> "race"), t, Seq.empty)
      ()
    }
    try {
      val v = MiniDelta.overwrite(spark, rows(9L -> "X"), t, Seq.empty,
        replaceWhereCond = Some(col("id") >= 5L && col("id") <= 10L))
      assert(v == MiniDelta.latestVersion(spark, t))
    } finally MiniDelta.beforeDmlCommitHook = () => ()
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet == Set(1L, 9L, 100L))
  }

  test("INSERT INTO ... REPLACE WHERE SQL verb") {
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "amt"), t, Seq.empty)
    GraftSqlTables.register("spec_rw", t, readOnly = false)
    try {
      spark.sql(
        "INSERT INTO graft.spec_rw REPLACE WHERE amt >= 20 " +
          "SELECT * FROM VALUES (7, 70), (8, 80) AS s(k, amt)")
      MiniDelta.invalidateSnapshot(t)
      val out = spark.sql("SELECT k, amt FROM graft.spec_rw")
        .as[(Long, Long)].collect().toSet
      assert(out == Set(1L -> 10L, 7L -> 70L, 8L -> 80L), out)
      // out-of-scope incoming rows refuse through SQL too
      val e = intercept[Exception](spark.sql(
        "INSERT INTO graft.spec_rw REPLACE WHERE amt >= 100 " +
          "VALUES (9, 5)"))
      assert(e.getMessage.contains("outside the replaced scope"))
    } finally GraftSqlTables.clear()
  }
}
