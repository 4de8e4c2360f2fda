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

  test("nested SET DEFAULT (r18): omission materializes the default — " +
      "omitted struct, subset struct, provided value wins; DROP " +
      "removes the obligation") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("a", StructType(Seq(
        StructField("city", StringType),
        StructField("zip", LongType)))))))
    MiniDelta.setColumnDefault(spark, t, "a.zip", Some("42"))
    MiniDelta.invalidateSnapshot(t)
    val aT = MiniDelta.latestSchema(spark, t).get("a").dataType
      .asInstanceOf[StructType]
    assert(aT("zip").metadata.getString("CURRENT_DEFAULT") == "42")
    // a constant of the wrong shape refuses; a column reference refuses
    intercept[IllegalArgumentException](
      MiniDelta.setColumnDefault(spark, t, "a.zip", Some("k + 1")))
    // subset struct: the defaulted field fills, provided fields keep
    MiniDelta.append(spark, Seq((1L, "c1")).toDF("k", "city")
      .select(col("k"), struct(col("city")).as("a")), t, Seq.empty)
    // omitted struct column entirely: defaults + nulls
    MiniDelta.append(spark, Seq(Tuple1(2L)).toDF("k"), t, Seq.empty)
    // provided value wins (DEFAULT constrains omission, not content)
    MiniDelta.append(spark, Seq((3L, "c3", 30L)).toDF("k", "city", "zip")
      .select(col("k"),
        struct(col("city"), col("zip")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"), col("a.zip"))
      .as[(Long, Option[String], Option[Long])].collect().toSet
    assert(out == Set(
      (1L, Some("c1"), Some(42L)),
      (2L, None, Some(42L)),
      (3L, Some("c3"), Some(30L))), out.toString)
    // DROP DEFAULT: later omission reads null again
    MiniDelta.setColumnDefault(spark, t, "a.zip", None)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark, Seq((4L, "c4")).toDF("k", "city")
      .select(col("k"), struct(col("city")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("k") === 4L).select(col("a.zip")).head().isNullAt(0))
    // dropping again has nothing to drop
    intercept[IllegalArgumentException](
      MiniDelta.setColumnDefault(spark, t, "a.zip", None))
    // composes with column MAPPING: the CURRENT_DEFAULT rides the
    // nested field beside its physicalName, and the materialized fill
    // lands under the physical layout
    val tm = freshTable()
    MiniDelta.createTable(spark, tm, StructType(Seq(
      StructField("k", LongType),
      StructField("a", StructType(Seq(
        StructField("city", StringType),
        StructField("zip", LongType)))))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.setColumnDefault(spark, tm, "a.zip", Some("42"))
    MiniDelta.invalidateSnapshot(tm)
    val zf = MiniDelta.latestSchema(spark, tm).get("a").dataType
      .asInstanceOf[StructType]("zip")
    assert(zf.metadata.getString("CURRENT_DEFAULT") == "42" &&
      zf.metadata.contains("delta.columnMapping.physicalName"))
    MiniDelta.append(spark, Seq(Tuple1(7L)).toDF("k"), tm, Seq.empty)
    MiniDelta.invalidateSnapshot(tm)
    assert(MiniDelta.readFiltered(spark, tm, Seq.empty)
      .select(col("a.zip")).head().getLong(0) == 42L)
    // SQL form on a nested path
    import graft.plans.GraftSqlTables
    GraftSqlTables.unregister("spec_nestdef")
    GraftSqlTables.register("spec_nestdef", t, readOnly = false)
    try {
      spark.sql("ALTER TABLE graft.spec_nestdef ALTER COLUMN a.zip " +
        "SET DEFAULT 7")
      MiniDelta.invalidateSnapshot(t)
      spark.sql("INSERT INTO graft.spec_nestdef (k) VALUES (5)")
      MiniDelta.invalidateSnapshot(t)
      val z = spark.sql("SELECT a.zip FROM graft.spec_nestdef " +
        "WHERE k = 5").as[Option[Long]].head()
      assert(z.contains(7L), z.toString)
    } finally GraftSqlTables.clear()
  }

  test("guards are path-aware (r18): a CHECK on top-level `a` no " +
      "longer blocks renaming meta.a; a CHECK on the dotted path or " +
      "the WHOLE ancestor struct still does") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("a", LongType),
      StructField("meta", StructType(Seq(
        StructField("a", LongType),
        StructField("b", LongType)))))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.addConstraint(spark, t, "a_pos", "a > 0")
    MiniDelta.invalidateSnapshot(t)
    // r17 refused this on the leaf name; path-aware matching allows it
    MiniDelta.renameColumn(spark, t, "meta.a", "aa")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestSchema(spark, t).get("meta").dataType
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("aa", "b"))
    // a constraint referencing the DOTTED path refuses rename AND drop
    MiniDelta.addConstraint(spark, t, "mb", "meta.b > 0")
    MiniDelta.invalidateSnapshot(t)
    val e1 = intercept[IllegalArgumentException](
      MiniDelta.renameColumn(spark, t, "meta.b", "bb"))
    assert(e1.getMessage.contains("mb"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MiniDelta.dropColumn(spark, t, "meta.b"))
    assert(e2.getMessage.contains("mb"), e2.getMessage)
    // the sibling un-referenced field still alters freely
    MiniDelta.renameColumn(spark, t, "meta.aa", "az")
    MiniDelta.invalidateSnapshot(t)
    // SQL accepts whitespace around the dot in qualified names — the
    // guard must catch that spelling too
    MiniDelta.addConstraint(spark, t, "mbs", "meta . b < 100")
    MiniDelta.invalidateSnapshot(t)
    val e2b = intercept[IllegalArgumentException](
      MiniDelta.renameColumn(spark, t, "meta.b", "bb"))
    assert(e2b.getMessage.contains("mbs"), e2b.getMessage)
    // ...while a whitespace-dot FIELD ACCESS does not read as a
    // whole-ancestor use for the sibling
    MiniDelta.renameColumn(spark, t, "meta.az", "aa")
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.dropConstraint(spark, t, "mbs")
    MiniDelta.invalidateSnapshot(t)
    // a constraint using the ancestor struct WHOLE blocks its fields
    MiniDelta.dropConstraint(spark, t, "mb")
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.addConstraint(spark, t, "mj", "to_json(meta) IS NOT NULL")
    MiniDelta.invalidateSnapshot(t)
    val e3 = intercept[IllegalArgumentException](
      MiniDelta.renameColumn(spark, t, "meta.b", "bb"))
    assert(e3.getMessage.contains("mj"), e3.getMessage)
    // ...but does NOT block an unrelated top-level column (k is
    // referenced by nothing; a_pos still pins top-level a)
    MiniDelta.renameColumn(spark, t, "k", "k2")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestSchema(spark, t).get.fieldNames.toSeq ==
      Seq("k2", "a", "meta"))
    val e3b = intercept[IllegalArgumentException](
      MiniDelta.renameColumn(spark, t, "a", "a2"))
    assert(e3b.getMessage.contains("a_pos"), e3b.getMessage)
    // generated guard, same precision: generation over top-level a2
    // does not block the nested rename; over the dotted path it does
    val g = freshTable()
    val genMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "meta.b * 2").build()
    MiniDelta.createTable(spark, g, StructType(Seq(
      StructField("meta", StructType(Seq(
        StructField("a", LongType),
        StructField("b", LongType)))),
      StructField("h", LongType, nullable = true, genMeta))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.renameColumn(spark, g, "meta.a", "aa") // not referenced
    MiniDelta.invalidateSnapshot(g)
    val e4 = intercept[IllegalArgumentException](
      MiniDelta.renameColumn(spark, g, "meta.b", "bb"))
    assert(e4.getMessage.contains("h"), e4.getMessage)
  }

  test("nested ALTER crosses arrays and maps (r18): element/value " +
      "paths ADD/RENAME/WIDEN/DROP struct fields inside containers; " +
      "terminal element widens the array's element type with the " +
      "spec's fieldPath record") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("xs", ArrayType(StructType(Seq(
        StructField("x", IntegerType),
        StructField("y", StringType))))),
      StructField("m", MapType(StringType, StructType(Seq(
        StructField("v", IntegerType),
        StructField("w", StringType))))),
      StructField("ns", ArrayType(IntegerType)))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq(1L).toDF("k").select(col("k"),
      array(struct(lit(7).as("x"), lit("p").as("y"))).as("xs"),
      map(lit("q"), struct(lit(3).as("v"), lit("u").as("w"))).as("m"),
      array(lit(5)).as("ns")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // ADD a field inside the array's element struct
    MiniDelta.addColumns(spark, t, Seq(
      StructField("xs.element.z", LongType)))
    MiniDelta.invalidateSnapshot(t)
    // RENAME a field inside the element struct: stored bytes keep
    // reading under the new logical name
    MiniDelta.renameColumn(spark, t, "xs.element.x", "xx")
    MiniDelta.invalidateSnapshot(t)
    // WIDEN the renamed nested field (int -> long, no rewrite)
    MiniDelta.widenColumnType(spark, t, "xs.element.xx", LongType)
    MiniDelta.invalidateSnapshot(t)
    // WIDEN a map value's struct field
    MiniDelta.widenColumnType(spark, t, "m.value.v", LongType)
    MiniDelta.invalidateSnapshot(t)
    // TERMINAL element: widen the array's element TYPE itself; the
    // typeChanges record lands on the array FIELD with fieldPath
    MiniDelta.widenColumnType(spark, t, "ns.element", LongType)
    MiniDelta.invalidateSnapshot(t)
    val sch = MiniDelta.latestSchema(spark, t).get
    val nsMeta = sch("ns").metadata
      .getMetadataArray("delta.typeChanges")
    assert(nsMeta.length == 1 &&
      nsMeta.head.getString("fieldPath") == "element" &&
      nsMeta.head.getString("toType") == "long", nsMeta.mkString)
    assert(sch("ns").dataType == ArrayType(LongType))
    // DROP a field inside the element struct
    MiniDelta.dropColumn(spark, t, "xs.element.y")
    MiniDelta.invalidateSnapshot(t)
    val xsT = MiniDelta.latestSchema(spark, t).get("xs").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(xsT.fieldNames.toSeq == Seq("xx", "z"))
    // the stored narrow bytes read back under every change
    val row = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("xs")(0).getField("xx"), col("xs")(0).getField("z"),
        element_at(col("m"), "q").getField("v"), col("ns")(0))
      .head()
    assert(row.getLong(0) == 7L && row.isNullAt(1) &&
      row.getLong(2) == 3L && row.getLong(3) == 5L, row.toString)
    // writes at the evolved shape land
    MiniDelta.append(spark, Seq(2L).toDF("k").select(col("k"),
      array(struct(lit(8L).as("xx"), lit(80L).as("z"))).as("xs"),
      map(lit("r"), struct(lit(4L).as("v"), lit("u2").as("w"))).as("m"),
      array(lit(6L)).as("ns")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 2)
    // a non-container, non-struct crossing still refuses loudly
    val e = intercept[IllegalArgumentException](
      MiniDelta.dropColumn(spark, t, "k.x"))
    assert(e.getMessage.contains("not a struct"), e.getMessage)
  }

  test("one CDF feed spans a nested TYPE widening: pre-widen cdc " +
      "files carry the narrow type and upcast through the declared " +
      "read") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("a", StructType(Seq(
        StructField("city", StringType),
        StructField("zip", IntegerType)))))),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    MiniDelta.append(spark,
      Seq((1L, "c1", 10), (2L, "c2", 20)).toDF("k", "city", "zip")
        .select(col("k"),
          struct(col("city"), col("zip")).as("a")), t, Seq.empty) // v1
    MiniDelta.invalidateSnapshot(t)
    // v2: an UPDATE writes cdc files with the NARROW (int) zip
    MiniDelta.update(spark, t, col("k") === 2L,
      Map("a" -> struct(col("a.city").as("city"),
        lit(21).cast("int").as("zip"))), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // v3: widen the nested field
    MiniDelta.widenColumnType(spark, t, "a.zip", LongType)
    MiniDelta.invalidateSnapshot(t)
    // v4: an UPDATE writes cdc files with the WIDE (long) zip
    MiniDelta.update(spark, t, col("k") === 1L,
      Map("a" -> struct(col("a.city").as("city"),
        lit(11L).as("zip"))), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // one feed across narrow-cdc, widen, wide-cdc: every zip upcasts
    // through the declared (wide) read
    val feed = MiniDelta.readCdf(spark, t, 0)
      .select(col("_change_type"), col("k"), col("a.zip"))
      .as[(String, Long, Long)].collect().toSet
    assert(feed == Set(
      ("insert", 1L, 10L), ("insert", 2L, 20L),
      ("update_preimage", 2L, 20L), ("update_postimage", 2L, 21L),
      ("update_preimage", 1L, 10L), ("update_postimage", 1L, 11L)),
      feed.toString)
    // the feed's declared type is the WIDE one
    assert(MiniDelta.readCdf(spark, t, 0).schema("a").dataType
      .asInstanceOf[StructType]("zip").dataType == LongType)
  }

  test("ALTER COLUMN COMMENT / FIRST-AFTER / DROP NOT NULL (r18): " +
      "metadata-only, nested paths compose, SET NOT NULL refuses " +
      "with the CHECK guidance") {
    import graft.plans.GraftSqlTables
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("a", StructType(Seq(
        StructField("city", StringType),
        StructField("zip", LongType)))))))
    MiniDelta.append(spark,
      Seq((1L, "c1", 10L)).toDF("k", "city", "zip")
        .select(col("k"),
          struct(col("city"), col("zip")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val v0 = MiniDelta.latestVersion(spark, t)
    // COMMENT on a nested field: one commit, the metadata key rides it
    MiniDelta.setColumnComment(spark, t, Seq("a", "zip"), "postal code")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestVersion(spark, t) == v0 + 1)
    assert(MiniDelta.latestSchema(spark, t).get("a").dataType
      .asInstanceOf[StructType]("zip").metadata
      .getString("comment") == "postal code")
    // '' clears it
    MiniDelta.setColumnComment(spark, t, Seq("a", "zip"), "")
    MiniDelta.invalidateSnapshot(t)
    assert(!MiniDelta.latestSchema(spark, t).get("a").dataType
      .asInstanceOf[StructType]("zip").metadata.contains("comment"))
    // FIRST at the top level: declaration order flips, data still reads
    MiniDelta.moveColumn(spark, t, Seq("a"), after = None)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestSchema(spark, t).get.fieldNames.toSeq ==
      Seq("a", "k"))
    // AFTER moves it back
    MiniDelta.moveColumn(spark, t, Seq("a"), after = Some("k"))
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestSchema(spark, t).get.fieldNames.toSeq ==
      Seq("k", "a"))
    // nested FIRST: siblings inside the struct reorder, bytes keep
    // reading by name
    MiniDelta.moveColumn(spark, t, Seq("a", "zip"), after = None)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestSchema(spark, t).get("a").dataType
      .asInstanceOf[StructType].fieldNames.toSeq ==
      Seq("zip", "city"))
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"), col("a.zip"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "c1", 10L)), out.toString)
    // writes at the NEW declaration order land and read back
    MiniDelta.append(spark,
      Seq((2L, 20L, "c2")).toDF("k", "zip", "city")
        .select(col("k"),
          struct(col("zip"), col("city")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("k") === 2L).select(col("a.zip"))
      .head().getLong(0) == 20L)
    // AFTER a missing sibling refuses by name
    val em = intercept[IllegalArgumentException](
      MiniDelta.moveColumn(spark, t, Seq("a", "zip"), Some("nope")))
    assert(em.getMessage.contains("no such column"), em.getMessage)
    // DROP NOT NULL relaxes the declared flag; SET NOT NULL refuses
    // pointing at the enforced CHECK surface
    MiniDelta.setColumnNullability(spark, t, Seq("k"), nullable = true)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestSchema(spark, t).get("k").nullable)
    val en = intercept[IllegalArgumentException](
      MiniDelta.setColumnNullability(spark, t, Seq("k"),
        nullable = false))
    assert(en.getMessage.contains("CHECK"), en.getMessage)
    // SQL forms
    GraftSqlTables.unregister("spec_altmisc")
    GraftSqlTables.register("spec_altmisc", t, readOnly = false)
    try {
      spark.sql("ALTER TABLE graft.spec_altmisc ALTER COLUMN a.city " +
        "COMMENT 'city name'")
      spark.sql("ALTER TABLE graft.spec_altmisc ALTER COLUMN a FIRST")
      spark.sql("ALTER TABLE graft.spec_altmisc ALTER COLUMN a " +
        "AFTER k")
      spark.sql("ALTER TABLE graft.spec_altmisc ALTER COLUMN k " +
        "DROP NOT NULL")
      MiniDelta.invalidateSnapshot(t)
      val sch = MiniDelta.latestSchema(spark, t).get
      assert(sch.fieldNames.toSeq == Seq("k", "a"))
      assert(sch("a").dataType.asInstanceOf[StructType]("city")
        .metadata.getString("comment") == "city name")
      val es = intercept[Exception](spark.sql(
        "ALTER TABLE graft.spec_altmisc ALTER COLUMN k SET NOT NULL"))
      assert(es.getMessage.contains("CHECK"), es.getMessage)
      // positioned ADD COLUMNS (r18): FIRST / AFTER place the new
      // fields among their siblings — top-level and nested in one
      // statement ('a' is (zip, city) at this point)
      spark.sql("ALTER TABLE graft.spec_altmisc ADD COLUMNS " +
        "(tag STRING FIRST, a.geo STRING AFTER zip)")
      MiniDelta.invalidateSnapshot(t)
      val sch2 = MiniDelta.latestSchema(spark, t).get
      assert(sch2.fieldNames.toSeq == Seq("tag", "k", "a"),
        sch2.fieldNames.mkString(","))
      assert(sch2("a").dataType.asInstanceOf[StructType]
        .fieldNames.toSeq == Seq("zip", "geo", "city"))
      // a positioned add AFTER a missing sibling refuses by name
      val ep = intercept[Exception](spark.sql(
        "ALTER TABLE graft.spec_altmisc ADD COLUMNS " +
          "(t2 STRING AFTER nope)"))
      assert(ep.getMessage.contains("no such column"), ep.getMessage)
      // data written before the adds still reads under the new layout
      assert(spark.sql("SELECT a.zip FROM graft.spec_altmisc " +
        "WHERE k = 1").as[Long].head() == 10L)
    } finally GraftSqlTables.clear()
  }

  test("REPLACE COLUMNS (r18): drop + add + reorder in ONE metadata " +
      "commit; survivors keep type and metadata, dropped bytes never " +
      "resurrect, type changes and unmapped tables refuse") {
    import graft.plans.GraftSqlTables
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("v", StringType),
      StructField("gone", LongType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark,
      Seq((1L, "x", 100L), (2L, "y", 200L)).toDF("k", "v", "gone"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val v0 = MiniDelta.latestVersion(spark, t)
    val physV = MiniDelta.latestSchema(spark, t).get("v").metadata
      .getString("delta.columnMapping.physicalName")
    MiniDelta.replaceColumns(spark, t, Seq(
      StructField("v", StringType, nullable = true,
        new MetadataBuilder().putString("comment", "the value").build()),
      StructField("k", LongType),
      StructField("fresh", LongType)))
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestVersion(spark, t) == v0 + 1) // one commit
    val sch = MiniDelta.latestSchema(spark, t).get
    assert(sch.fieldNames.toSeq == Seq("v", "k", "fresh"))
    // survivor keeps its physicalName (bytes keep reading) + new comment
    assert(sch("v").metadata
      .getString("delta.columnMapping.physicalName") == physV)
    assert(sch("v").metadata.getString("comment") == "the value")
    assert(sch("fresh").metadata
      .contains("delta.columnMapping.physicalName"))
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("v"), col("fresh"))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(out == Set((1L, "x", None), (2L, "y", None)), out.toString)
    // re-adding the dropped name gets a FRESH physical: old bytes dark
    MiniDelta.replaceColumns(spark, t, Seq(
      StructField("v", StringType), StructField("k", LongType),
      StructField("fresh", LongType), StructField("gone", LongType)))
    MiniDelta.invalidateSnapshot(t)
    val g2 = MiniDelta.latestSchema(spark, t).get("gone")
    assert(g2.metadata.getString("delta.columnMapping.physicalName")
      != "gone")
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("gone").collect().forall(_.isNullAt(0)))
    // ...and the restated survivor WITHOUT a comment clears it
    assert(!MiniDelta.latestSchema(spark, t).get("v").metadata
      .contains("comment"))
    // a type change refuses by name
    val et = intercept[IllegalArgumentException](
      MiniDelta.replaceColumns(spark, t, Seq(
        StructField("k", StringType), StructField("v", StringType))))
    assert(et.getMessage.contains("cannot change"), et.getMessage)
    // dropping a constraint-referenced column refuses
    MiniDelta.addConstraint(spark, t, "k_pos", "k > 0")
    MiniDelta.invalidateSnapshot(t)
    val ec = intercept[IllegalArgumentException](
      MiniDelta.replaceColumns(spark, t, Seq(
        StructField("v", StringType))))
    assert(ec.getMessage.contains("k_pos"), ec.getMessage)
    // unmapped tables refuse with the mapping hint
    val tu = freshTable()
    MiniDelta.append(spark, Seq((1L, "a")).toDF("k", "v"), tu, Seq.empty)
    MiniDelta.invalidateSnapshot(tu)
    val eu = intercept[IllegalArgumentException](
      MiniDelta.replaceColumns(spark, tu, Seq(
        StructField("k", LongType))))
    assert(eu.getMessage.contains("column mapping"), eu.getMessage)
    // SQL form
    GraftSqlTables.unregister("spec_replcols")
    GraftSqlTables.register("spec_replcols", t, readOnly = false)
    try {
      spark.sql("ALTER TABLE graft.spec_replcols DROP CONSTRAINT k_pos")
      spark.sql("ALTER TABLE graft.spec_replcols REPLACE COLUMNS " +
        "(k BIGINT, v STRING COMMENT 'vv')")
      MiniDelta.invalidateSnapshot(t)
      val sch3 = MiniDelta.latestSchema(spark, t).get
      assert(sch3.fieldNames.toSeq == Seq("k", "v"))
      assert(sch3("v").metadata.getString("comment") == "vv")
      assert(spark.sql("SELECT count(*) FROM graft.spec_replcols " +
        "WHERE v IS NOT NULL").as[Long].head() == 2L)
    } finally GraftSqlTables.clear()
  }

  test("REPLACE COLUMNS composition (r19): clustering guard, no " +
      "smuggled gen/default metadata on NEW columns, SQL refuses " +
      "FIRST/AFTER, time travel keeps the pre-replace schema, feeds " +
      "refuse across the boundary and render per era") {
    import graft.plans.GraftSqlTables
    // shedding a clustering column would orphan the never-retracting
    // delta.clustering domain — same refusal as DROP COLUMN
    val tc = freshTable()
    MiniDelta.createTable(spark, tc, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"),
      clusterBy = Seq("id"))
    val ecl = intercept[IllegalArgumentException](
      MiniDelta.replaceColumns(spark, tc, Seq(
        StructField("v", StringType), StructField("w", LongType))))
    assert(ecl.getMessage.contains("clustering column"), ecl.getMessage)
    // CLUSTER BY NONE frees the column (the feature stays declared —
    // the guard probes the DOMAIN, not the protocol)
    MiniDelta.setClusterBy(spark, tc, Seq.empty)
    MiniDelta.invalidateSnapshot(tc)
    MiniDelta.replaceColumns(spark, tc, Seq(
      StructField("v", StringType), StructField("w", LongType)))
    MiniDelta.invalidateSnapshot(tc)
    assert(MiniDelta.latestSchema(spark, tc).get.fieldNames.toSeq ==
      Seq("v", "w"))
    // a NEW column may not smuggle generation/default obligations in
    // (their writer features aren't negotiated by this verb)
    val eg = intercept[IllegalArgumentException](
      MiniDelta.replaceColumns(spark, tc, Seq(
        StructField("v", StringType),
        StructField("g", LongType, nullable = true,
          new MetadataBuilder()
            .putString("delta.generationExpression", "1 + 1").build()))))
    assert(eg.getMessage.contains("generated"), eg.getMessage)
    val ed = intercept[IllegalArgumentException](
      MiniDelta.replaceColumns(spark, tc, Seq(
        StructField("v", StringType),
        StructField("dd", LongType, nullable = true,
          new MetadataBuilder()
            .putString("CURRENT_DEFAULT", "7").build()))))
    assert(ed.getMessage.contains("SET DEFAULT"), ed.getMessage)
    // ...nor pre-stamped mapping metadata (a caller-chosen physical
    // name could alias dropped bytes — no-resurrection)
    val ep = intercept[IllegalArgumentException](
      MiniDelta.replaceColumns(spark, tc, Seq(
        StructField("v", StringType),
        StructField("ghost", LongType, nullable = true,
          new MetadataBuilder().putString(
            "delta.columnMapping.physicalName", "id").build()))))
    assert(ep.getMessage.contains("resurrect"), ep.getMessage)
    // ...but a SURVIVOR's established default rides through (full
    // metadata keep — the feature was declared when the default landed)
    MiniDelta.setColumnDefault(spark, tc, "w", Some("5"))
    MiniDelta.invalidateSnapshot(tc)
    MiniDelta.replaceColumns(spark, tc, Seq(
      StructField("w", LongType), StructField("v", StringType)))
    MiniDelta.invalidateSnapshot(tc)
    assert(MiniDelta.latestSchema(spark, tc).get("w").metadata
      .getString("CURRENT_DEFAULT") == "5")

    // lifecycle for the read-side pins: v1 insert under (k, note),
    // v2 REPLACE drops note + adds tag, v3 insert under (k, tag)
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("note", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name",
        "delta.enableChangeDataFeed" -> "true"))
    MiniDelta.append(spark,
      Seq((1L, "n1"), (2L, "n2")).toDF("k", "note"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.replaceColumns(spark, t, Seq(
      StructField("k", LongType), StructField("tag", StringType)))
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark, Seq((3L, "t3")).toDF("k", "tag"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // time travel: the pre-replace version keeps ITS schema
    assert(MiniDelta.latestSchema(spark, t, 1L).get.fieldNames.toSeq ==
      Seq("k", "note"))
    // a feed ACROSS the boundary refuses loudly, naming the loss —
    // rendering under the post-drop schema would silently omit note
    val ec = intercept[IllegalStateException](
      MiniDelta.readCdf(spark, t, -1L).count())
    assert(ec.getMessage.contains("DROPPED") &&
      ec.getMessage.contains("note"), ec.getMessage)
    // the append feed (the streaming source's path) refuses the same
    val ea = intercept[IllegalStateException](
      MiniDelta.readAppends(spark, t, 0L).count())
    assert(ea.getMessage.contains("DROPPED"), ea.getMessage)
    // ...and so does the file-level incremental feed
    val er = intercept[IllegalStateException](
      MiniDelta.readChanges(spark, t, 0L).count())
    assert(er.getMessage.contains("DROPPED"), er.getMessage)
    // per-era windows render fine on both sides of the boundary
    val pre = MiniDelta.readCdf(spark, t, -1L, 1L)
      .select("k", "note", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(pre == Set((1L, "n1", "insert"), (2L, "n2", "insert")),
      pre.toString)
    val post = MiniDelta.readCdf(spark, t, 2L)
      .select("k", "tag", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(post == Seq((3L, "t3", "insert")), post.toString)
    // SQL: FIRST/AFTER inside the restated list refuses — the list
    // order is what binds. Spark's own parser blocks the clause
    // upstream ("Column position is not supported in Hive-style
    // REPLACE COLUMNS"); the engine's rule keeps its own guard for
    // programmatically-built plans, so EITHER refusal message counts —
    // what's pinned is that the statement never silently drops it
    GraftSqlTables.unregister("spec_rc19")
    GraftSqlTables.register("spec_rc19", t, readOnly = false)
    try {
      val ef = intercept[Exception](spark.sql(
        "ALTER TABLE graft.spec_rc19 REPLACE COLUMNS " +
          "(tag STRING FIRST, k BIGINT)"))
      assert(ef.getMessage.contains("list order") ||
        ef.getMessage.contains("position is not supported"),
        ef.getMessage)
    } finally GraftSqlTables.clear()
  }

  test("feed guard composes with RESTORE and CLONE (r19): a restore " +
      "bringing the dropped column back HEALS the boundary (no era " +
      "lost anything anymore); a clone of a replaced table carries " +
      "the post-replace schema with survivor physical names") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("note", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq((1L, "n1")).toDF("k", "note"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val vPre = MiniDelta.latestVersion(spark, t)
    MiniDelta.dropColumn(spark, t, "note")
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark, Seq(Tuple1(2L)).toDF("k"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // while dropped: a cross-boundary feed refuses
    val e = intercept[IllegalStateException](
      MiniDelta.readChanges(spark, t, 0L).count())
    assert(e.getMessage.contains("DROPPED"), e.getMessage)
    MiniDelta.restore(spark, t, vPre)
    MiniDelta.invalidateSnapshot(t)
    // restored: the end schema carries note again under its ORIGINAL
    // physical key (restore re-commits the old metaData), so no era
    // lost anything — the SAME feed now renders; pre-drop rows serve
    // their stored bytes, drop-era rows read null (they never had it)
    val feed = MiniDelta.readChanges(spark, t, 0L)
      .select(col("k"), col("note")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(feed == Set((1L, Some("n1")), (2L, None)), feed.toString)
    // CLONE after a REPLACE: the clone's v0 metaData IS the replaced
    // declaration — survivors keep physicalName so the (source) bytes
    // keep reading through the clone
    MiniDelta.replaceColumns(spark, t, Seq(
      StructField("k", LongType), StructField("tag", StringType)))
    MiniDelta.invalidateSnapshot(t)
    val physK = MiniDelta.latestSchema(spark, t).get("k").metadata
      .getString("delta.columnMapping.physicalName")
    val dst = freshTable()
    MiniDelta.cloneShallow(spark, t, dst)
    MiniDelta.invalidateSnapshot(dst)
    val cs = MiniDelta.latestSchema(spark, dst).get
    assert(cs.fieldNames.toSeq == Seq("k", "tag"), cs.treeString)
    assert(cs("k").metadata.getString(
      "delta.columnMapping.physicalName") == physK)
    assert(!cs.fieldNames.contains("note"))
    val cloneRows = MiniDelta.readFiltered(spark, dst, Seq.empty)
      .select(col("k"), col("tag")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(cloneRows == Set((1L, None)), cloneRows.toString)
  }
}
