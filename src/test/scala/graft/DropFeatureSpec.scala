package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.plans.GraftSqlTables

/** `ALTER TABLE ... DROP FEATURE` ([[MiniDelta.dropFeature]]): Delta's
  * protocol DOWNGRADE — pre-downgrade trace purge, the reader-feature
  * history gate (TRUNCATE HISTORY), and the one-commit protocol action
  * minus the feature. The reference has no protocol at all (it proxies
  * whatever the log says); the semantics here follow the Delta
  * removable-features contract. */
class DropFeatureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("dropfeat").toString + "/t"

  private def commitJson(t: String, v: Long): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(
      f"$t%s/_delta_log/$v%020d.json"))

  private def logFiles(t: String): Seq[String] =
    new java.io.File(s"$t/_delta_log").listFiles().toSeq
      .map(_.getName).filter(_.headOption.exists(_.isDigit)).sorted

  test("deletionVectors: purge + TRUNCATE HISTORY downgrade") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      properties = Map("delta.enableDeletionVectors" -> "true"))
    MiniDelta.append(spark,
      (1L to 10L).map(i => (i, s"r$i")).toDF("id", "v"), t, Seq.empty)
    MiniDelta.delete(spark, t, col("id") <= 3L, Seq.empty) // DV mask
    MiniDelta.invalidateSnapshot(t)
    // live masks + enabled property + traced history: the bare drop
    // refuses toward TRUNCATE HISTORY
    val gate = intercept[IllegalArgumentException](
      MiniDelta.dropFeature(spark, t, "deletionVectors"))
    assert(gate.getMessage.contains("TRUNCATE HISTORY"))
    val v = MiniDelta.dropFeature(spark, t, "deletionVectors",
      truncateHistory = true)
    MiniDelta.invalidateSnapshot(t)
    // the downgrade commit carries the protocol MINUS the feature and
    // the reader version normalizes to 1 (no reader feature remains)
    val dg = commitJson(t, v)
    assert(dg.contains("\"protocol\""))
    assert(!dg.contains("deletionVectors"), dg)
    assert(dg.contains("\"minReaderVersion\":1"), dg)
    // rows exact after the purge; no DV descriptor anywhere
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet == (4L to 10L).toSet)
    // the prior log is GONE: only the downgrade commit + its
    // checkpoint survive, and time travel below fails loudly
    val names = logFiles(t)
    assert(names.exists(_.endsWith(f"$v%020d.json")), names)
    assert(!names.exists(_.endsWith(f"${0L}%020d.json")), names)
    val tt = intercept[Exception](
      MiniDelta.snapshotFilesAt(spark, t, 0L).collect())
    assert(tt != null)
    // writes continue normally after the downgrade
    MiniDelta.append(spark, Seq((99L, "post")).toDF("id", "v"), t,
      Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 8)
    // re-dropping refuses: the feature is no longer declared
    val again = intercept[IllegalArgumentException](
      MiniDelta.dropFeature(spark, t, "deletionVectors",
        truncateHistory = true))
    assert(again.getMessage.contains("not declared"))
  }

  test("inCommitTimestamp: writer-only drop, no history gate") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType))),
      properties = Map("delta.enableInCommitTimestamps" -> "true"))
    MiniDelta.append(spark, Seq(Tuple1(1L)).toDF("id"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // TRUNCATE HISTORY refuses on a writer-only feature
    val th = intercept[IllegalArgumentException](
      MiniDelta.dropFeature(spark, t, "inCommitTimestamp",
        truncateHistory = true))
    assert(th.getMessage.contains("reader features only"))
    val v = MiniDelta.dropFeature(spark, t, "inCommitTimestamp")
    MiniDelta.invalidateSnapshot(t)
    // the downgrade PROTOCOL drops the feature. (The downgrade
    // commitInfo itself still stamps an in-commit timestamp — the
    // feature is active until this commit lands, exactly like the
    // enablement commit stamps one; later commits stop.)
    val protoLine = commitJson(t, v).linesIterator
      .find(_.contains("\"protocol\"")).get
    assert(!protoLine.contains("inCommitTimestamp"), protoLine)
    MiniDelta.append(spark, Seq(Tuple1(2L)).toDF("id"), t, Seq.empty)
    assert(!commitJson(t, v + 1).contains("inCommitTimestamp"))
    // the enablement/provenance properties are unset by the
    // pre-downgrade commit
    val cfg = MiniDelta.tableConfig(spark, t)
    assert(!cfg.contains("delta.enableInCommitTimestamps"))
    assert(!cfg.contains("delta.inCommitTimestampEnablementVersion"))
    // history below the drop is UNTOUCHED (writer drops don't gate)
    assert(logFiles(t).exists(_.endsWith(f"${0L}%020d.json")))
  }

  test("live-trace refusals: variant column, column DEFAULT, widen") {
    // variantType: a declared VARIANT column blocks the drop
    val tv = freshTable()
    MiniDelta.createTable(spark, tv, StructType(Seq(
      StructField("id", LongType), StructField("p", VariantType))))
    val ev = intercept[IllegalArgumentException](
      MiniDelta.dropFeature(spark, tv, "variantType",
        truncateHistory = true))
    assert(ev.getMessage.contains("VARIANT column"))
    // allowColumnDefaults: a declared DEFAULT blocks; dropping the
    // DEFAULT unblocks
    val td = freshTable()
    MiniDelta.createTable(spark, td, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    MiniDelta.setColumnDefault(spark, td, "v", Some("'filled'"))
    val ed = intercept[IllegalArgumentException](
      MiniDelta.dropFeature(spark, td, "allowColumnDefaults"))
    assert(ed.getMessage.contains("DROP DEFAULT"))
    MiniDelta.setColumnDefault(spark, td, "v", None)
    MiniDelta.invalidateSnapshot(td)
    val vd = MiniDelta.dropFeature(spark, td, "allowColumnDefaults")
    assert(!commitJson(td, vd).contains("allowColumnDefaults"))
  }

  test("typeWidening drop composition (r19): live typeChanges refuse " +
      "the drop; REPLACE COLUMNS shedding the widened column unblocks " +
      "it; feeds never silently null-fill across the span") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("amt", IntegerType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq((1L, 7)).toDF("id", "amt"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.widenColumnType(spark, t, "amt",
      org.apache.spark.sql.types.LongType)
    MiniDelta.invalidateSnapshot(t)
    // the pre-widen file still stores the narrow physical type: the
    // drop refuses by column name while the typeChanges record lives
    val ew = intercept[IllegalArgumentException](
      MiniDelta.dropFeature(spark, t, "typeWidening",
        truncateHistory = true))
    assert(ew.getMessage.contains("amt") &&
      ew.getMessage.contains("typeChanges"), ew.getMessage)
    // REPLACE COLUMNS sheds the widened column — no record survives
    MiniDelta.replaceColumns(spark, t, Seq(
      StructField("id", LongType), StructField("note", StringType)))
    MiniDelta.invalidateSnapshot(t)
    // a feed across the REPLACE refuses loudly (amt's era data would
    // silently vanish under the post-drop schema)
    val ef = intercept[IllegalStateException](
      MiniDelta.readAppends(spark, t, 0L).count())
    assert(ef.getMessage.contains("DROPPED") &&
      ef.getMessage.contains("amt"), ef.getMessage)
    // now the reader-feature downgrade passes under TRUNCATE HISTORY
    val vd = MiniDelta.dropFeature(spark, t, "typeWidening",
      truncateHistory = true)
    MiniDelta.invalidateSnapshot(t)
    assert(!commitJson(t, vd).contains("typeWidening"))
    // post-downgrade writes + feeds run clean under the new contract
    MiniDelta.append(spark, Seq((2L, "n2")).toDF("id", "note"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val rows = MiniDelta.readAppends(spark, t, vd)
      .select("id", "note").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((2L, "n2")), rows.toString)
  }

  test("non-removable and absent features refuse by name") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType))))
    val e1 = intercept[IllegalArgumentException](
      MiniDelta.dropFeature(spark, t, "rowTracking"))
    assert(e1.getMessage.contains("removable features"))
    // removable but never declared on this table
    val e2 = intercept[IllegalArgumentException](
      MiniDelta.dropFeature(spark, t, "inCommitTimestamp"))
    assert(e2.getMessage.contains("not declared"))
  }

  test("SQL verb: ALTER TABLE ... DROP FEATURE ... TRUNCATE HISTORY") {
    val dir = Files.createTempDirectory("dropfeatsql").toString
    val t = s"$dir/t"
    GraftSqlTables.unregister("spec_dropfeat")
    spark.sql(s"""
      CREATE TABLE graft.spec_dropfeat (id BIGINT, v STRING)
      TBLPROPERTIES ('delta.enableDeletionVectors' = 'true')
      LOCATION '$t'""")
    spark.sql(
      "INSERT INTO graft.spec_dropfeat VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("DELETE FROM graft.spec_dropfeat WHERE id = 2")
    val bare = intercept[Exception](spark.sql(
      "ALTER TABLE graft.spec_dropfeat DROP FEATURE deletionVectors"))
    assert(bare.getMessage.contains("TRUNCATE HISTORY"))
    val rows = spark.sql("""
      ALTER TABLE graft.spec_dropfeat DROP FEATURE deletionVectors
      TRUNCATE HISTORY""").collect()
    assert(rows.length == 1)
    val v = rows(0).getLong(0)
    assert(!commitJson(t, v).contains("deletionVectors"))
    assert(spark.sql("SELECT id FROM graft.spec_dropfeat ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 3L))
    // DESCRIBE HISTORY reflects the truncation: only the downgrade
    // commit (and anything after) survives
    val hist = spark.sql("DESCRIBE HISTORY graft.spec_dropfeat")
      .select("version").as[Long].collect().toSet
    assert(hist.min == v, hist)
  }
}
