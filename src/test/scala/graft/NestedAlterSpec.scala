package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Nested ALTER on column-mapped tables (r17 — unlocked by the
  * depth-assigned mapping metadata): `RENAME COLUMN a.b TO c` and
  * `DROP COLUMN a.b` are metadata-only commits exactly like their
  * top-level forms — the nested physicalName keeps pointing at (or
  * stops referencing) the bytes already on disk, no file rewrites.
  * The drop-then-re-add case pins Delta's no-resurrection contract:
  * a re-added same-name nested field gets a FRESH physical name, so
  * the dropped bytes stay dark. */
class NestedAlterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("nestalter").toString + "/t"

  private def mk(t: String): Unit = {
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("a", StructType(Seq(
        StructField("city", StringType),
        StructField("zip", LongType)))))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark,
      Seq((1L, "c1", 10L), (2L, "c2", 20L)).toDF("k", "city", "zip")
        .select(col("k"),
          struct(col("city"), col("zip")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
  }

  test("nested RENAME is metadata-only: the stored bytes keep reading " +
      "under the new logical name; sibling clash refuses") {
    val t = freshTable(); mk(t)
    val v0 = MiniDelta.latestVersion(spark, t)
    MiniDelta.renameColumn(spark, t, "a.zip", "zipcode")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestVersion(spark, t) == v0 + 1) // one commit
    val aT = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get("a").dataType
      .asInstanceOf[StructType]
    assert(aT.fieldNames.toSeq == Seq("city", "zipcode"))
    // physicalName survived the rename — the OLD bytes resolve
    assert(aT("zipcode").metadata
      .getString("delta.columnMapping.physicalName") == "zip")
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.zipcode"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 20L)))
    // writes under the NEW logical name land in the physical column
    MiniDelta.append(spark,
      Seq((3L, "c3", 30L)).toDF("k", "city", "zipcode")
        .select(col("k"),
          struct(col("city"), col("zipcode")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("k") === 3L).select("a.zipcode").head().getLong(0)
      == 30L)
    val e = intercept[IllegalArgumentException](
      MiniDelta.renameColumn(spark, t, "a.city", "zipcode"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }

  test("nested DROP is metadata-only and a re-added same-name field " +
      "NEVER resurrects the dropped bytes") {
    val t = freshTable(); mk(t)
    MiniDelta.dropColumn(spark, t, "a.city")
    MiniDelta.invalidateSnapshot(t)
    val aT = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get("a").dataType
      .asInstanceOf[StructType]
    assert(aT.fieldNames.toSeq == Seq("zip"))
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("a.zip").collect().map(_.getLong(0)).toSet
      == Set(10L, 20L))
    // evolving append re-introduces 'city': fresh physical name, so
    // the OLD rows read NULL — never the dropped "c1"/"c2" bytes
    MiniDelta.append(spark,
      Seq((9L, "fresh", 90L)).toDF("k", "city", "zip")
        .select(col("k"),
          struct(col("zip"), col("city")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val aT2 = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get("a").dataType
      .asInstanceOf[StructType]
    val phys2 = aT2("city").metadata
      .getString("delta.columnMapping.physicalName")
    assert(phys2 != "city" && phys2.startsWith("col_"),
      s"re-added nested field must get a FRESH physical name, got " +
        phys2)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"))
      .as[(Long, Option[String])].collect().toSet
    assert(out == Set((1L, None), (2L, None), (9L, Some("fresh"))),
      out.toString)
    // the struct must not end up empty
    val t2 = freshTable()
    MiniDelta.createTable(spark, t2, StructType(Seq(
      StructField("k", LongType),
      StructField("a", StructType(Seq(
        StructField("only", StringType)))))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    val e = intercept[IllegalArgumentException](
      MiniDelta.dropColumn(spark, t2, "a.only"))
    assert(e.getMessage.contains("only field"), e.getMessage)
    // a path crossing a non-struct refuses by name
    val e2 = intercept[IllegalArgumentException](
      MiniDelta.dropColumn(spark, t, "k.x"))
    assert(e2.getMessage.contains("not a struct"), e2.getMessage)
  }

  test("nested ADD COLUMNS appends inside the struct: old rows read " +
      "null, mapped tables stamp depth metadata, clashes refuse") {
    val t = freshTable(); mk(t)
    MiniDelta.addColumns(spark, t, Seq(
      StructField("a.geo", StringType, nullable = false))) // forced null
    MiniDelta.invalidateSnapshot(t)
    val aT = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get("a").dataType
      .asInstanceOf[StructType]
    assert(aT.fieldNames.toSeq == Seq("city", "zip", "geo"))
    assert(aT("geo").nullable)
    assert(aT("geo").metadata
      .contains("delta.columnMapping.physicalName"))
    // writes land it; old rows null-fill
    MiniDelta.append(spark,
      Seq((3L, "c3", 30L, "G3")).toDF("k", "city", "zip", "geo")
        .select(col("k"), struct(col("city"), col("zip"),
          col("geo")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.geo"))
      .as[(Long, Option[String])].collect().toSet
    assert(out == Set((1L, None), (2L, None), (3L, Some("G3"))), out)
    val e = intercept[IllegalArgumentException](
      MiniDelta.addColumns(spark, t, Seq(
        StructField("a.ZIP", LongType))))
    assert(e.getMessage.contains("already exist"), e.getMessage)
    // UNMAPPED tables take nested adds too (no mapping needed to
    // append a field that old files simply lack)
    val tu = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "x")).toDF("k", "city")
        .select(col("k"), struct(col("city")).as("a")), tu, Seq.empty)
    MiniDelta.invalidateSnapshot(tu)
    MiniDelta.addColumns(spark, tu, Seq(StructField("a.n", LongType)))
    MiniDelta.invalidateSnapshot(tu)
    assert(MiniDelta.readFiltered(spark, tu, Seq.empty)
      .select("a.n").head().isNullAt(0))
  }

  test("one CDF feed spans a nested RENAME; RESTORE below a nested " +
      "DROP brings the field's stored bytes back") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("a", StructType(Seq(
        StructField("city", StringType),
        StructField("zip", LongType)))))),
      properties = Map("delta.columnMapping.mode" -> "name",
        "delta.enableChangeDataFeed" -> "true"))
    MiniDelta.append(spark,
      Seq((1L, "c1", 10L), (2L, "c2", 20L)).toDF("k", "city", "zip")
        .select(col("k"),
          struct(col("city"), col("zip")).as("a")), t, Seq.empty) // v1
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.renameColumn(spark, t, "a.zip", "zc")             // v2
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.update(spark, t, col("k") === 2L,
      Map("a" -> struct(col("a.city").as("city"),
        lit(99L).as("zc"))), Seq.empty)                          // v3
    MiniDelta.invalidateSnapshot(t)
    // one feed spans the rename: pre-rename inserts and post-rename
    // update images all read under the CURRENT logical name a.zc
    // (the cdc files store the stable physical 'zip')
    val feed = MiniDelta.readCdf(spark, t, 0, 3)
      .select(col("_change_type"), col("k"), col("a.zc"))
      .as[(String, Long, Long)].collect().toSet
    assert(feed == Set(
      ("insert", 1L, 10L), ("insert", 2L, 20L),
      ("update_preimage", 2L, 20L), ("update_postimage", 2L, 99L)),
      feed.toString)
    // RESTORE below a nested DROP: the field returns WITH its stored
    // bytes (drop is metadata-only, so nothing was lost)
    val vBeforeDrop = MiniDelta.latestVersion(spark, t)
    MiniDelta.dropColumn(spark, t, "a.city")
    MiniDelta.invalidateSnapshot(t)
    assert(!MiniDelta.latestSchema(spark, t).get("a").dataType
      .asInstanceOf[StructType].fieldNames.contains("city"))
    MiniDelta.restore(spark, t, vBeforeDrop)
    MiniDelta.invalidateSnapshot(t)
    val back = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"))
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "c1"), (2L, "c2")), back.toString)
  }

  test("SQL forms: ALTER TABLE ... RENAME/DROP a nested path") {
    import graft.plans.GraftSqlTables
    val t = freshTable(); mk(t)
    GraftSqlTables.unregister("spec_nestalter")
    GraftSqlTables.register("spec_nestalter", t, readOnly = false)
    try {
      spark.sql(
        "ALTER TABLE graft.spec_nestalter RENAME COLUMN a.zip TO zc")
      spark.sql("ALTER TABLE graft.spec_nestalter DROP COLUMN a.city")
      spark.sql(
        "ALTER TABLE graft.spec_nestalter ADD COLUMNS (a.geo STRING)")
      MiniDelta.invalidateSnapshot(t)
      val out = spark.sql(
        "SELECT k, a.zc, a.geo FROM graft.spec_nestalter ORDER BY k")
        .as[(Long, Long, Option[String])].collect().toSeq
      assert(out == Seq((1L, 10L, None), (2L, 20L, None)), out.toString)
    } finally GraftSqlTables.clear()
  }
}
