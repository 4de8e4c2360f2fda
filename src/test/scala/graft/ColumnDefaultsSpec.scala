package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Column DEFAULT values (Delta writer feature `allowColumnDefaults`):
  * a declared CURRENT_DEFAULT is MATERIALIZED into every row-producing
  * write that omits the column — that obligation is the writer
  * feature's contract, so v0 declares it and foreign tables requiring
  * it are writable. DEFAULT constrains omission, not content: provided
  * values always win, and existing rows never change when a default is
  * declared or dropped later.
  */
class ColumnDefaultsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("coldef").toString + "/t"

  private def defMeta(sql: String) =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putString("CURRENT_DEFAULT", sql).build()

  test("CREATE with DEFAULT declares the feature; writes materialize it") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType),
      StructField("status", StringType, nullable = true,
        defMeta("'new'")),
      StructField("score", DoubleType, nullable = true,
        defMeta("CAST(0.5 AS DOUBLE)")))))
    val v0 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$t/_delta_log/${"0" * 20}.json"))
    assert(v0.contains("\"allowColumnDefaults\""), v0)
    assert(v0.contains("CURRENT_DEFAULT"), v0)
    // append omitting BOTH defaulted columns: filled, not null
    MiniDelta.append(spark, Seq(1L, 2L).toDF("id"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // append providing one: provided wins, the other fills
    MiniDelta.append(spark, Seq((3L, "done")).toDF("id", "status"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val got = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "status", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "new", 0.5), (2L, "new", 0.5),
      (3L, "done", 0.5)), got)
  }

  test("SET DEFAULT applies to future writes only; DROP removes the fill") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "a")).toDF("id", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.setColumnDefault(spark, t, "v", Some("'filled'"))
    MiniDelta.invalidateSnapshot(t)
    // the enabling commit declares the writer feature
    val v = MiniDelta.latestVersion(spark, t)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(
      f"$t/_delta_log/$v%020d.json"))
    assert(txt.contains("\"allowColumnDefaults\""), txt)
    // future omission fills; the pre-default row is untouched
    MiniDelta.append(spark, Seq(2L).toDF("id"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "v").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "filled")))
    // DROP: omission goes back to the legal subset-append null-fill
    MiniDelta.setColumnDefault(spark, t, "v", None)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark, Seq(3L).toDF("id"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("id") === 3L).select("v").head().isNullAt(0))
    // a second DROP has nothing to remove
    intercept[IllegalArgumentException](
      MiniDelta.setColumnDefault(spark, t, "v", None))
  }

  test("a generated column may reference a defaulted one (fill runs first)") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType),
      StructField("d", LongType, nullable = true, defMeta("5L")),
      StructField("g", LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.generationExpression", "d * 2").build()))))
    // omit BOTH: the default fills first, the generated expr computes
    // over the filled value
    MiniDelta.append(spark, Seq(1L, 2L).toDF("id"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "d", "g").as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 5L, 10L), (2L, 5L, 10L)))
    // provide d: the provided value feeds the generated expr
    MiniDelta.append(spark, Seq((3L, 7L)).toDF("id", "d"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("id") === 3L).select("g").head().getLong(0) == 14L)
  }

  test("DEFAULT through containers refuses (r19): an array/map " +
      "element has no omission event to materialize the fill at") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("x", LongType))))),
      StructField("attrs", MapType(StringType, StructType(Seq(
        StructField("y", LongType))))))))
    // elements arrive wholesale: there is no per-element omission a
    // writer could fill, so the container-crossing path refuses (the
    // structOnly contract) — in both spellings
    val ea = intercept[IllegalArgumentException](
      MiniDelta.setColumnDefault(spark, t,
        Seq("tags", "element", "x"), Some("1"), readOnly = false))
    assert(ea.getMessage.contains("struct fields only"), ea.getMessage)
    val em = intercept[IllegalArgumentException](
      MiniDelta.setColumnDefault(spark, t,
        Seq("attrs", "value", "y"), Some("1"), readOnly = false))
    assert(em.getMessage.contains("struct fields only"), em.getMessage)
    // ...and the refusal left no commit behind (metadata untouched)
    assert(MiniDelta.latestVersion(spark, t) == 0L)
  }

  test("DEFAULT must be constant; merge and overwrite fill it too") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("v", StringType),
      StructField("tag", StringType, nullable = true,
        defMeta("'t0'")))))
    // a default referencing another column refuses loudly
    val e = intercept[IllegalArgumentException](
      MiniDelta.setColumnDefault(spark, t, "tag", Some("k + 1")))
    assert(e.getMessage.contains("constant"), e.getMessage)
    // ... including a reference named `id`, which the eval frame's
    // underlying range(1) would otherwise silently resolve
    val e2 = intercept[IllegalArgumentException](
      MiniDelta.setColumnDefault(spark, t, "tag", Some("id")))
    assert(e2.getMessage.contains("constant"), e2.getMessage)
    MiniDelta.append(spark, Seq((1L, "a")).toDF("k", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // merge source omits tag: both the matched replacement and the
    // insert are written with the fill
    MiniDelta.merge(spark, t,
      Seq((1L, "A"), (2L, "b")).toDF("k", "v"), Seq("k"), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("k", "v", "tag").as[(Long, String, String)]
      .collect().toSet == Set((1L, "A", "t0"), (2L, "b", "t0")))
    // overwrite omitting tag fills as well
    MiniDelta.overwrite(spark, Seq((9L, "z")).toDF("k", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("k", "v", "tag").as[(Long, String, String)]
      .collect().toSet == Set((9L, "z", "t0")))
  }
}
