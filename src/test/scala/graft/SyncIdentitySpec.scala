package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.plans.GraftSqlTables

/** `ALTER TABLE ... ALTER COLUMN c SYNC IDENTITY` — Delta's identity
  * resync: the mark re-derives from the values actually stored, so a
  * range stranded by DELETEs is reclaimed, an emptied table restarts
  * at START, and non-identity columns refuse. */
class SyncIdentitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("syncid").toString + "/t"

  private def idMeta(start: Long, step: Long) = new MetadataBuilder()
    .putLong("delta.identity.start", start)
    .putLong("delta.identity.step", step)
    .putString("comment", "surrogate key")
    .build()

  private def mkTable(start: Long = 10L, step: Long = 2L): String = {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta(start, step)),
      StructField("v", StringType))))
    t
  }

  private def ids(t: String): Seq[Long] = {
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
  }

  test("SYNC reclaims range stranded by DELETE; chain continues past it") {
    val t = mkTable()
    MiniDelta.append(spark, Seq("a", "b", "c", "d", "e").toDF("v"), t,
      Seq.empty)
    assert(ids(t) == Seq(10L, 12L, 14L, 16L, 18L))
    // delete the top of the chain: the mark stays at 18 without a sync
    MiniDelta.delete(spark, t, col("id") >= 16L, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val hwm = MiniDelta.syncIdentity(spark, t, "id")
    assert(hwm.contains(14L))
    MiniDelta.append(spark, Seq("f").toDF("v"), t, Seq.empty)
    assert(ids(t) == Seq(10L, 12L, 14L, 16L))
    // idempotent: a second sync reads the same data, commits nothing
    val vBefore = MiniDelta.latestVersion(spark, t)
    assert(MiniDelta.syncIdentity(spark, t, "id").contains(16L))
    assert(MiniDelta.latestVersion(spark, t) == vBefore)
  }

  test("SYNC on an emptied table clears the mark; chain restarts at START") {
    val t = mkTable(start = 100L, step = 5L)
    MiniDelta.append(spark, Seq("a", "b").toDF("v"), t, Seq.empty)
    assert(ids(t) == Seq(100L, 105L))
    MiniDelta.delete(spark, t, lit(true), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.syncIdentity(spark, t, "id").isEmpty)
    // unrelated field metadata (the comment) survives the key removal
    MiniDelta.invalidateSnapshot(t)
    val f = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get.fields.head
    assert(!f.metadata.contains("delta.identity.highWaterMark"))
    assert(f.metadata.getString("comment") == "surrogate key")
    MiniDelta.append(spark, Seq("c").toDF("v"), t, Seq.empty)
    assert(ids(t) == Seq(100L))
  }

  test("SYNC refuses non-identity columns and honors read-only") {
    val t = mkTable()
    val e = intercept[IllegalArgumentException](
      MiniDelta.syncIdentity(spark, t, "v"))
    assert(e.getMessage.contains("not an identity column"))
    intercept[MiniDelta.ReadOnlyTableException](
      MiniDelta.syncIdentity(spark, t, "id", readOnly = true))
  }

  test("ALTER TABLE ... SYNC IDENTITY SQL verb returns the new mark") {
    val t = mkTable(start = 1L, step = 1L)
    MiniDelta.append(spark, Seq("a", "b", "c").toDF("v"), t, Seq.empty)
    MiniDelta.delete(spark, t, col("id") === 3L, Seq.empty)
    GraftSqlTables.register("spec_syncid", t, readOnly = false)
    try {
      val r = spark.sql(
        "ALTER TABLE graft.spec_syncid ALTER COLUMN id SYNC IDENTITY")
        .head()
      assert(r.getLong(0) == 2L)
      MiniDelta.append(spark, Seq("d").toDF("v"), t, Seq.empty)
      assert(ids(t) == Seq(1L, 2L, 3L))
    } finally GraftSqlTables.clear()
  }
}
