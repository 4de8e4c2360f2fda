package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Delta typeWidening: ALTER COLUMN TYPE re-declares a column at a
  * WIDER type in one metadata commit — no file rewrite, because reads
  * scan under the declared (wide) schema and Spark's parquet reader
  * upcasts the narrow files (int→long, float→double, date→
  * timestamp_ntz, integral→decimal all verified on this Spark). The
  * change is recorded in the field's `delta.typeChanges` metadata and
  * the typeWidening reader+writer feature joins the protocol (a
  * pre-feature reader would mis-type the narrow files). */
class TypeWideningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("widen").toString + "/t"

  test("widen int->long: metadata-only, both eras read, DML works") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.append(spark,
      spark.range(3).select(col("id").cast("int").as("n"),
        concat(lit("v"), col("id")).as("v")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val filesBefore = MiniDelta.snapshotFiles(spark, t)
      .select("path").collect().map(_.getString(0)).toSet
    MiniDelta.widenColumnType(spark, t, "n", LongType)
    MiniDelta.invalidateSnapshot(t)
    // metadata-only: the same files serve the new declared type
    assert(MiniDelta.snapshotFiles(spark, t)
      .select("path").collect().map(_.getString(0)).toSet == filesBefore)
    val schema = MiniDelta.latestSchema(spark, t).get
    assert(schema("n").dataType == LongType)
    val tc = schema("n").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 && tc(0).getString("fromType") == "integer" &&
      tc(0).getString("toType") == "long", tc.toSeq)
    // the widening commit carries the reader+writer feature
    val v = MiniDelta.latestVersion(spark, t)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(
      f"$t/_delta_log/$v%020d.json"))
    assert(txt.contains("\"typeWidening\"") &&
      txt.contains("readerFeatures") && txt.contains("writerFeatures"),
      txt)
    // old (int) files upcast; a wide append lands long natively
    MiniDelta.append(spark,
      Seq((3000000000L, "big")).toDF("n", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("n").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3000000000L))
    // copy-on-write DML reads the mixed files under the wide schema
    MiniDelta.delete(spark, t, col("n") === 1L, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 3)
    // time travel BEFORE the widen (v0 = the first append) shows the
    // narrow type
    assert(MiniDelta.readFiltered(spark, t, Seq.empty,
      versionAsOf = Some(0L)).schema("n").dataType == IntegerType)
  }

  test("widening matrix: chains accumulate, non-widenings refuse") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1.toShort, 1.5f, 7)).toDF("s", "f", "d"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.widenColumnType(spark, t, "s", IntegerType)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.widenColumnType(spark, t, "s", LongType)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.widenColumnType(spark, t, "f", DoubleType)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.widenColumnType(spark, t, "d", DecimalType(12, 2))
    MiniDelta.invalidateSnapshot(t)
    val schema = MiniDelta.latestSchema(spark, t).get
    assert(schema("s").dataType == LongType)
    assert(schema("s").metadata.getMetadataArray("delta.typeChanges")
      .map(m => (m.getString("fromType"), m.getString("toType"))).toSeq
      == Seq(("short", "integer"), ("integer", "long")))
    val got = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("s", "f", "d").head()
    assert((got.getLong(0), got.getDouble(1),
      got.getDecimal(2).doubleValue()) == ((1L, 1.5, 7.0)))
    // refusals: narrowing, cross-kind, scale-headroom loss, unknown
    intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "s", IntegerType))
    intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "f", LongType))
    intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "d", DecimalType(12, 4)))
    intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "nope", LongType))
    // partition columns refuse (directory values are typed)
    val p = freshTable()
    MiniDelta.append(spark, Seq((1, "x")).toDF("n", "p"), p, Seq("p"))
    intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, p, "p", TimestampNTZType))
  }

  test("guards: spec decimal thresholds, constraint and generated refs") {
    import org.apache.spark.sql.types._
    // integral→decimal follows the spec matrix: precision−scale ≥ 10
    // for byte/short/int, ≥ 20 for long — byte→decimal(5,2) would
    // record a typeChanges entry compliant readers reject
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1.toByte, 2L, 3, 4)).toDF("b", "l", "c", "g"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "b", DecimalType(5, 2)))
    intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "l", DecimalType(19, 0)))
    MiniDelta.widenColumnType(spark, t, "b", DecimalType(12, 2)) // 10≥10
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.widenColumnType(spark, t, "l", DecimalType(20, 0)) // 20≥20
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("b", "l").head().toSeq.map(_.toString) ==
      Seq("1.00", "2"))
    // a CHECK constraint reading the column pins its type: hash()/mod
    // semantics differ by width, so widening under it refuses
    MiniDelta.addConstraint(spark, t, "c_pos", "c > 0")
    MiniDelta.invalidateSnapshot(t)
    val ce = intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "c", LongType))
    assert(ce.getMessage.contains("c_pos"), ce.getMessage)
    // same for a generated column deriving from it
    val g = freshTable()
    val genMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "hash(n)").build()
    MiniDelta.createTable(spark, g, StructType(Seq(
      StructField("n", IntegerType),
      StructField("h", IntegerType, nullable = true, genMeta))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    val ge = intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, g, "n", LongType))
    assert(ge.getMessage.contains("h"), ge.getMessage)
    // rename/drop of a generated-referenced column would silently
    // unbind the expression — both refuse too (mapping is enabled, so
    // only the guard can be the refusal)
    intercept[IllegalArgumentException](
      MiniDelta.renameColumn(spark, g, "n", "m"))
    intercept[IllegalArgumentException](
      MiniDelta.dropColumn(spark, g, "n"))
    // the generated column ITSELF widens/renames fine (its expression
    // reads n, not h)
    MiniDelta.renameColumn(spark, g, "h", "hh")
    MiniDelta.invalidateSnapshot(g)
    assert(MiniDelta.latestSchema(spark, g).get.fieldNames.toSeq ==
      Seq("n", "hh"))
  }

  test("widen composes with id-mode mapping, rename, and DML") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("n", IntegerType))),
      properties = Map("delta.columnMapping.mode" -> "id"))
    MiniDelta.append(spark, Seq((1L, 10), (2L, 20)).toDF("id", "n"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.widenColumnType(spark, t, "n", LongType)
    MiniDelta.invalidateSnapshot(t)
    // the mapping metadata (physicalName + field id) survives the
    // widen — a post-widen rename stays metadata-only and the id-mode
    // footer resolution keeps matching the narrow files
    MiniDelta.renameColumn(spark, t, "n", "num")
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark, Seq((3L, 3000000000L)).toDF("id", "num"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "num").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 20L), (3L, 3000000000L)))
    // copy-on-write DML reads the mixed-width files by footer id
    MiniDelta.delete(spark, t, col("num") === 10L, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 2)
  }

  test("one CDF feed spans a widen: narrow-era cdc upcasts") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("n", IntegerType))),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    MiniDelta.append(spark, Seq((1L, 10), (2L, 20)).toDF("id", "n"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.delete(spark, t, col("id") === 1L, Seq.empty) // v2: narrow cdc
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.widenColumnType(spark, t, "n", LongType) // v3
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.update(spark, t, col("id") === 2L,
      Map("n" -> lit(3000000000L)), Seq.empty) // v4: wide cdc
    MiniDelta.invalidateSnapshot(t)
    // the v2 cdc files store int32, the v4 ones int64 — one feed under
    // the current (wide) declared type serves both eras
    val got = MiniDelta.readCdf(spark, t, 1L, 4L)
      .select("id", "n", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 10L, "delete"),
      (2L, 20L, "update_preimage"),
      (2L, 3000000000L, "update_postimage")), got)
  }

  test("SQL ALTER COLUMN TYPE widens; stats skipping still works") {
    import graft.plans.GraftSqlTables
    val dir = Files.createTempDirectory("widensql").toString
    GraftSqlTables.unregister("spec_widen")
    spark.sql(s"""
      CREATE TABLE graft.spec_widen (n INT, v STRING)
      LOCATION '$dir/t'""")
    try {
      spark.sql("INSERT INTO graft.spec_widen VALUES (1, 'a'), (2, 'b')")
      spark.sql("ALTER TABLE graft.spec_widen ALTER COLUMN n TYPE BIGINT")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      spark.sql("INSERT INTO graft.spec_widen VALUES (3000000000, 'c')")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql(
        "SELECT sum(n) FROM graft.spec_widen").head().getLong(0)
        == 3000000003L)
      // a non-widening TYPE change refuses through SQL too
      val e = intercept[Exception](spark.sql(
        "ALTER TABLE graft.spec_widen ALTER COLUMN n TYPE INT"))
      assert(e.getMessage.contains("widen"), e.getMessage)
    } finally GraftSqlTables.clear()
  }

  test("NESTED widen (r17): a.n int->long is metadata-only, the " +
      "typeChanges record rides the nested field, narrow files upcast") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.append(spark,
      spark.range(3).select(col("id").as("k"),
        struct(col("id").cast("int").as("n"),
          concat(lit("c"), col("id")).as("city")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val filesBefore = MiniDelta.snapshotFiles(spark, t)
      .select("path").collect().map(_.getString(0)).toSet
    MiniDelta.widenColumnType(spark, t, "a.n", LongType)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.snapshotFiles(spark, t)
      .select("path").collect().map(_.getString(0)).toSet == filesBefore)
    val aT = MiniDelta.latestSchema(spark, t).get("a").dataType
      .asInstanceOf[StructType]
    assert(aT("n").dataType == LongType)
    val tc = aT("n").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 && tc(0).getString("fromType") == "integer" &&
      tc(0).getString("toType") == "long", tc.toSeq)
    // the narrow file upcasts through the declared-schema read, and a
    // post-widen append lands wide values beside it
    MiniDelta.append(spark,
      Seq((9L, 3000000000L, "c9")).toDF("k", "n", "city")
        .select(col("k"),
          struct(col("n"), col("city")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .agg(sum(col("a.n"))).head().getLong(0) == 3000000003L)
    // non-widening nested change refuses; missing nested path refuses
    val e = intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "a.city", LongType))
    assert(e.getMessage.contains("widen"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MiniDelta.widenColumnType(spark, t, "a.zzz", LongType))
    assert(e2.getMessage.contains("no such column"), e2.getMessage)
    // SQL form on a nested path: narrowing refuses, a further legal
    // widening (long -> decimal(21,0)) lands
    import graft.plans.GraftSqlTables
    GraftSqlTables.unregister("spec_widen_nested")
    GraftSqlTables.register("spec_widen_nested", t, readOnly = false)
    try {
      val e3 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.spec_widen_nested ALTER COLUMN a.n TYPE INT"))
      assert(e3.getMessage.contains("widen"), e3.getMessage)
      spark.sql("ALTER TABLE graft.spec_widen_nested " +
        "ALTER COLUMN a.n TYPE DECIMAL(21,0)")
      MiniDelta.invalidateSnapshot(t)
      val aT2 = MiniDelta.latestSchema(spark, t).get("a").dataType
        .asInstanceOf[StructType]
      assert(aT2("n").dataType == DecimalType(21, 0))
      assert(aT2("n").metadata
        .getMetadataArray("delta.typeChanges").length == 2)
    } finally GraftSqlTables.clear()
  }
}
