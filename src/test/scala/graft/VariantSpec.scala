package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Delta `variantType` (reader+writer feature): VARIANT columns ride
  * Spark 4's native variant parquet shape through every write path —
  * the engine's job is the protocol bookkeeping (declare the feature
  * wherever the type can join a schema: CREATE, REPLACE, ADD COLUMNS)
  * and the refusals where a metaData-only commit would declare the
  * type without its feature (blind-append evolution, overwriteSchema).
  */
class VariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("variant").toString + "/t"

  test("variant lifecycle: create, append, DML, OPTIMIZE, time travel") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("v", VariantType))))
    val v0 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$t/_delta_log/${"0" * 20}.json"))
    assert(v0.contains("\"variantType\"") &&
      v0.contains("readerFeatures"), v0)
    assert(v0.contains("\\\"type\\\":\\\"variant\\\""), v0)
    def rows(lo: Int, hi: Int) = spark.range(lo, hi).selectExpr("id",
      """parse_json(concat('{"k":', id, ',"tag":"x"}')) AS v""")
    MiniDelta.append(spark, rows(0, 4).toDF(), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark, rows(4, 6).toDF(), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    def ks(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("variant_get(v, '$.k', 'long')").as[Long]
      .collect().sorted.toSeq
    assert(ks(MiniDelta.readFiltered(spark, t, Seq.empty)) ==
      (0L to 5L))
    // copy-on-write DML reads and rewrites variant files
    MiniDelta.delete(spark, t, expr("variant_get(v, '$.k', 'long') = 2"),
      Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(ks(MiniDelta.readFiltered(spark, t, Seq.empty)) ==
      Seq(0L, 1L, 3L, 4L, 5L))
    MiniDelta.compact(spark, t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(ks(MiniDelta.readFiltered(spark, t, Seq.empty)) ==
      Seq(0L, 1L, 3L, 4L, 5L))
    // time travel reads the variant era-exactly
    assert(ks(MiniDelta.readFiltered(spark, t, Seq.empty,
      versionAsOf = Some(1L))) == (0L to 3L))
  }

  test("variant via evolution: ADD COLUMNS declares, blind append refuses") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.append(spark, Seq((1L, "a")).toDF("id", "s"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // blind-append evolution cannot introduce the type (the commit
    // would declare variant without its feature)
    val e = intercept[IllegalArgumentException](MiniDelta.append(spark,
      spark.sql("""SELECT 2L AS id, 'b' AS s,
        parse_json('{"x":1}') AS v"""), t, Seq.empty))
    assert(e.getMessage.contains("ADD COLUMNS"), e.getMessage)
    // ADD COLUMNS declares the feature in the same commit
    MiniDelta.addColumns(spark, t,
      Seq(StructField("v", VariantType)))
    MiniDelta.invalidateSnapshot(t)
    val ver = MiniDelta.latestVersion(spark, t)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(
      f"$t/_delta_log/$ver%020d.json"))
    assert(txt.contains("\"variantType\""), txt)
    MiniDelta.append(spark, spark.sql(
      """SELECT 2L AS id, 'b' AS s, parse_json('{"x":1}') AS v"""),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // old rows null-fill the new variant column, the new row carries it
    val got = MiniDelta.readFiltered(spark, t, Seq.empty)
      .selectExpr("id", "variant_get(v, '$.x', 'long')").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> -1L, 2L -> 1L), got)
  }

  test("a struct already holding a VARIANT field does not block " +
      "unrelated nested growth beside it; a NEW nested variant " +
      "still refuses") {
    import org.apache.spark.sql.types._
    // the evolution gate checks only NEWLY appended fields (r17): the
    // feature-backed variant declared at CREATE is not a reason to
    // refuse appending an unrelated sibling inside the same struct
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType),
      StructField("a", StructType(Seq(
        StructField("v", VariantType), StructField("n", LongType)))))))
    MiniDelta.append(spark, spark.sql(
      """SELECT 1L AS id,
        named_struct('v', parse_json('{"x":1}'), 'n', 10L) AS a"""),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // unrelated sibling 'extra' appends inside the variant-bearing
    // struct — pre-r17 the whole-type variant sweep refused this
    MiniDelta.append(spark, spark.sql(
      """SELECT 2L AS id,
        named_struct('v', parse_json('{"x":2}'), 'n', 20L,
          'extra', 'e2') AS a"""), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val got = MiniDelta.readFiltered(spark, t, Seq.empty)
      .selectExpr("id", "variant_get(a.v, '$.x', 'long')", "a.extra")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(got == Set((1L, 1L, None), (2L, 2L, Some("e2"))), got)
    // but a NEW nested field of VARIANT type still refuses through
    // evolution (metaData-only commit cannot declare the feature —
    // irrelevant here since it is declared, but the gate is uniform
    // on a table WITHOUT the feature)
    val t2 = freshTable()
    MiniDelta.append(spark, Seq(1L).toDF("id")
      .select(col("id"), struct(lit(1L).as("n")).as("a")), t2, Seq.empty)
    MiniDelta.invalidateSnapshot(t2)
    val e = intercept[IllegalArgumentException](MiniDelta.append(spark,
      spark.sql("""SELECT 2L AS id,
        named_struct('n', 2L, 'w', parse_json('{"y":1}')) AS a"""),
      t2, Seq.empty))
    assert(e.getMessage.contains("VARIANT"), e.getMessage)
  }

  test("SQL: CREATE with VARIANT, INSERT parse_json, aggregate by field") {
    import graft.plans.GraftSqlTables
    val dir = Files.createTempDirectory("varsql").toString
    GraftSqlTables.unregister("spec_variant")
    spark.sql(s"""
      CREATE TABLE graft.spec_variant (id BIGINT, v VARIANT)
      LOCATION '$dir/t'""")
    try {
      spark.sql("""
        INSERT INTO graft.spec_variant
        SELECT id, parse_json(concat('{"q":', id % 3, '}'))
        FROM range(9)""")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val got = spark.sql("""
        SELECT variant_get(v, '$.q', 'long') AS q, count(*) AS n
        FROM graft.spec_variant GROUP BY q ORDER BY q""").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((0L, 3L), (1L, 3L), (2L, 3L)), got)
    } finally GraftSqlTables.clear()
  }
}
