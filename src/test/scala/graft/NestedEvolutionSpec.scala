package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** NESTED-struct schema evolution (r16 — delta-spark's autoMerge rule
  * at depth): an incoming struct column may APPEND fields at any depth;
  * declared fields keep position/type/metadata, leaf retypes still
  * reject, old files read the new nested fields as null, and
  * pre-evolution frames (rewrite survivors, CDF preimages) WIDEN
  * through the recursive null-fill before any union with evolved rows.
  * Column-mapped tables compose too (r17): appended nested fields get
  * fresh physicalName/ids at their own depth, ratcheted past
  * maxColumnId, and land in the files under the physical names. */
class NestedEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("nestevo").toString + "/t"

  private def addr(city: String, zip: Long) =
    struct(lit(city).as("city"), lit(zip).as("zip"))

  private def addr3(city: String, zip: Long, geo: String) =
    struct(lit(city).as("city"), lit(zip).as("zip"), lit(geo).as("geo"))

  test("append widens a struct column: old rows null-fill the new " +
      "nested field, leaf retypes still refuse") {
    val t = freshTable()
    MiniDelta.append(spark,
      Seq(1L).toDF("k").select(col("k"), addr("aa", 10L).as("a")),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark,
      Seq(2L).toDF("k").select(col("k"), addr3("bb", 20L, "G2").as("a")),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val sch = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get
    val aT = sch("a").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(aT.fieldNames.toSeq == Seq("city", "zip", "geo"))
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"), col("a.geo"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(out == Set((1L, "aa", None), (2L, "bb", Some("G2"))))
    // a leaf retype inside the struct is still a loud refusal
    val e = intercept[IllegalArgumentException](MiniDelta.append(spark,
      Seq(3L).toDF("k").select(col("k"),
        struct(lit(7).as("city"), lit(1L).as("zip")).as("a")),
      t, Seq.empty))
    assert(e.getMessage.contains("retype"), e.getMessage)
  }

  test("keyed MERGE widens: survivors in rewritten files carry null " +
      "nested fields beside the evolved source rows") {
    val t = freshTable()
    // ONE file holding both rows: the merge rewrites it, so the
    // surviving (unmatched) row must WIDEN through the union
    MiniDelta.append(spark,
      Seq(1L, 2L).toDF("k")
        .select(col("k"), addr("c1", 100L).as("a")).coalesce(1),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.merge(spark, t,
      Seq(2L, 9L).toDF("k")
        .select(col("k"), addr3("c2", 200L, "G9").as("a")),
      Seq("k"), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"), col("a.zip"), col("a.geo"))
      .as[(Long, String, Long, Option[String])].collect().toSet
    assert(out == Set(
      (1L, "c1", 100L, None),        // survivor: widened, geo null
      (2L, "c2", 200L, Some("G9")),  // matched: replaced wholesale
      (9L, "c2", 200L, Some("G9")))) // insert
  }

  test("DV-form merge and CDF feeds widen the preimages") {
    val t = freshTable()
    MiniDelta.createTable(spark, t,
      Seq(0L).toDF("k").select(col("k"), addr("z", 0L).as("a")).schema,
      properties = Map("delta.enableDeletionVectors" -> "true",
        "delta.enableChangeDataFeed" -> "true"))
    MiniDelta.append(spark,
      Seq(1L, 2L).toDF("k")
        .select(col("k"), addr("c1", 100L).as("a")).coalesce(1),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.merge(spark, t,
      Seq(1L).toDF("k")
        .select(col("k"), addr3("c9", 900L, "G1").as("a")),
      Seq("k"), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"), col("a.geo"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(out == Set((1L, "c9", Some("G1")), (2L, "c1", None)))
    // the mask (not a rewrite) handled the matched row
    assert(MiniDelta.snapshotFiles(spark, t)
      .where(col("dv_path").isNotNull).count() >= 1)
    // the feed spans the evolution: preimage renders widened (geo null)
    val feed = MiniDelta.readCdf(spark, t,
        MiniDelta.latestVersion(spark, t) - 1)
      .where(col("_change_type").startsWith("update"))
      .select(col("_change_type"), col("a.geo"))
      .as[(String, Option[String])].collect().toSet
    assert(feed == Set("update_preimage" -> None,
      "update_postimage" -> Some("G1")), feed)
  }

  test("OVERWRITE with replaceWhere widens rewrite survivors") {
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "x"), (2L, "y")).toDF("k", "p")
        .select(col("k"), col("p"), addr("c1", 100L).as("a")).coalesce(1),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.overwrite(spark,
      Seq((9L, "x")).toDF("k", "p")
        .select(col("k"), col("p"), addr3("c2", 200L, "G").as("a")),
      t, Seq.empty,
      replaceWhereCond = Some(col("p") === "x"))
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"), col("a.geo"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(out == Set((2L, "c1", None), (9L, "c2", Some("G"))))
  }

  test("identity table: the single metaData line carries the widened " +
      "struct and the mark; mapped tables grow nested fields under " +
      "fresh physical names") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, new MetadataBuilder()
        .putLong("delta.identity.start", 1L)
        .putLong("delta.identity.step", 1L).build()),
      StructField("a", StructType(Seq(
        StructField("city", StringType), StructField("zip", LongType)))))))
    MiniDelta.append(spark,
      Seq(1).toDF("x").select(addr("aa", 1L).as("a")).drop("x"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val v = MiniDelta.append(spark,
      Seq(1).toDF("x").select(addr3("bb", 2L, "G").as("a")).drop("x"),
      t, Seq.empty)
    val ml = Files.readString(java.nio.file.Paths.get(
      f"$t/_delta_log/$v%020d.json")).linesIterator
      .filter(_.contains("\"metaData\"")).toSeq
    assert(ml.length == 1 && ml.head.contains("geo") &&
      ml.head.contains("delta.identity.highWaterMark"))
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("id"), col("a.geo"))
      .as[(Long, Option[String])].collect().toSet
    assert(out == Set((1L, None), (2L, Some("G"))))
    // mapped: nested growth composes (r17 — the pre-r17 refusal is
    // gone): the appended nested field gets a FRESH physicalName/id
    // at its own depth, maxColumnId ratchets past it, the data file
    // stores the physical name, and the logical read round-trips
    val tm = freshTable()
    MiniDelta.createTable(spark, tm, StructType(Seq(
      StructField("k", LongType),
      StructField("a", StructType(Seq(
        StructField("city", StringType)))))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark,
      Seq(1L).toDF("k").select(col("k"), struct(lit("x").as("city")).as("a")),
      tm, Seq.empty)
    MiniDelta.invalidateSnapshot(tm)
    val maxBefore = MiniDelta.tableConfig(spark, tm)(
      "delta.columnMapping.maxColumnId").toLong
    MiniDelta.append(spark,
      Seq(2L).toDF("k").select(col("k"), addr("y", 9L).as("a")), tm,
      Seq.empty)
    MiniDelta.invalidateSnapshot(tm)
    val schM = MiniDelta.latestSchema(spark, tm,
      MiniDelta.latestVersion(spark, tm)).get
    val zipF = schM("a").dataType.asInstanceOf[StructType]("zip")
    assert(zipF.metadata.contains("delta.columnMapping.physicalName") &&
      zipF.metadata.contains("delta.columnMapping.id"),
      s"appended nested field must carry mapping metadata: $zipF")
    val zipPhys = zipF.metadata.getString("delta.columnMapping.physicalName")
    assert(zipPhys.startsWith("col_"), zipPhys)
    assert(zipF.metadata.getLong("delta.columnMapping.id") > maxBefore)
    assert(MiniDelta.tableConfig(spark, tm)(
      "delta.columnMapping.maxColumnId").toLong > maxBefore)
    // the evolving commit's file stores the PHYSICAL nested name
    val nestedCols = Option(new java.io.File(tm).listFiles()).toSeq
      .flatten.filter(_.getName.endsWith(".parquet"))
      .flatMap { p =>
        spark.read.parquet(p.getAbsolutePath).schema.fields.toSeq
          .flatMap(_.dataType match {
            case st: StructType => st.fieldNames.toSeq
            case _ => Seq.empty[String]
          })
      }.toSet
    assert(nestedCols.contains(zipPhys) && !nestedCols.contains("zip"),
      s"expected physical nested column $zipPhys (never logical " +
        s"'zip') in $nestedCols")
    val outM = MiniDelta.readFiltered(spark, tm, Seq.empty)
      .select(col("k"), col("a.city"), col("a.zip"))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(outM == Set((1L, "x", None), (2L, "y", Some(9L))))
  }

  test("keyed MERGE widens a struct on a COLUMN-MAPPED table: the " +
      "nested field gets a fresh physical name, survivors null-fill") {
    import org.apache.spark.sql.types._
    val tm = freshTable()
    MiniDelta.createTable(spark, tm, StructType(Seq(
      StructField("k", LongType),
      StructField("a", StructType(Seq(
        StructField("city", StringType)))))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark,
      Seq((1L, "c1"), (2L, "c2")).toDF("k", "city")
        .select(col("k"), struct(col("city")).as("a")), tm, Seq.empty)
    MiniDelta.invalidateSnapshot(tm)
    val src = Seq(2L).toDF("k").select(col("k"), addr("u2", 20L).as("a"))
      .union(Seq(9L).toDF("k").select(col("k"), addr("u9", 90L).as("a")))
    MiniDelta.merge(spark, tm, src, Seq("k"), Seq.empty)
    MiniDelta.invalidateSnapshot(tm)
    val schM = MiniDelta.latestSchema(spark, tm,
      MiniDelta.latestVersion(spark, tm)).get
    val zipF = schM("a").dataType.asInstanceOf[StructType]("zip")
    assert(zipF.metadata.contains("delta.columnMapping.physicalName"),
      zipF.toString)
    val out = MiniDelta.readFiltered(spark, tm, Seq.empty)
      .select(col("k"), col("a.city"), col("a.zip"))
      .as[(Long, String, Option[Long])].collect().toSet
    assert(out == Set((1L, "c1", None), (2L, "u2", Some(20L)),
      (9L, "u9", Some(90L))), out)
  }

  test("structs inside ARRAYS and MAP VALUES evolve; map-key changes " +
      "refuse") {
    val t = freshTable()
    def items(tag: String) = array(struct(lit(tag).as("sku")))
    def items2(tag: String, q: Long) = array(
      struct(lit(tag).as("sku"), lit(q).as("qty")))
    MiniDelta.append(spark,
      Seq(1L).toDF("k").select(col("k"), items("s1").as("it"),
        map(lit("a"), struct(lit(1L).as("x"))).as("m")),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // evolving append: array elements gain qty, map values gain y
    MiniDelta.append(spark,
      Seq(2L).toDF("k").select(col("k"), items2("s2", 7L).as("it"),
        map(lit("b"), struct(lit(2L).as("x"), lit("Y").as("y"))).as("m")),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("it")(0).getField("sku"),
        col("it")(0).getField("qty"),
        map_values(col("m"))(0).getField("y"))
      .as[(Long, String, Option[Long], Option[String])].collect().toSet
    assert(out == Set((1L, "s1", None, None),
      (2L, "s2", Some(7L), Some("Y"))))
    // a merge whose survivors carry the NARROW array widens them
    MiniDelta.merge(spark, t,
      Seq(9L).toDF("k").select(col("k"), items2("s9", 9L).as("it"),
        map(lit("c"), struct(lit(3L).as("x"), lit("Z").as("y"))).as("m")),
      Seq("k"), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 3)
    // changing a MAP KEY type is still a retype refusal
    val e = intercept[IllegalArgumentException](MiniDelta.append(spark,
      Seq(3L).toDF("k").select(col("k"), items("s3").as("it"),
        map(lit(1L), struct(lit(1L).as("x"))).as("m")),
      t, Seq.empty))
    assert(e.getMessage.contains("retype"), e.getMessage)
  }

  test("general MERGE widens an existing struct through SET/INSERT " +
      "(evolveSchema); SQL canonical merge gates nested growth behind " +
      "WITH SCHEMA EVOLUTION") {
    import graft.io.MiniDelta.{MergeInsertClause, MergeMatchedClause}
    val t = freshTable()
    MiniDelta.append(spark,
      Seq(1L, 2L).toDF("k")
        .select(col("k"), addr("c1", 100L).as("a")).coalesce(1),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val src = Seq(2L, 9L).toDF("k")
      .select(col("k"), addr3("c2", 200L, "G").as("a"))
    MiniDelta.mergeClauses(spark, t, src, Seq("k"),
      matched = Seq(MergeMatchedClause(None,
        Some(Map("a" -> col("__src_a"))))),
      notMatched = Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "a" -> col("a")))),
      bySource = Seq.empty, partitionBy = Seq.empty,
      evolveSchema = true)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"), col("a.geo"))
      .as[(Long, String, Option[String])].collect().toSet
    assert(out == Set((1L, "c1", None), (2L, "c2", Some("G")),
      (9L, "c2", Some("G"))))
    // SQL canonical merge: nested growth without the flag refuses
    val dir = Files.createTempDirectory("nestevosql").toString
    graft.plans.GraftSqlTables.clear()
    spark.sql(s"""
      CREATE TABLE graft.ne_t (k BIGINT,
        a STRUCT<city: STRING, zip: BIGINT>)
      LOCATION '$dir/t'""")
    try {
      spark.sql("INSERT INTO graft.ne_t SELECT 1L AS k, " +
        "named_struct('city', 'c1', 'zip', 100L) AS a")
      Seq(1L).toDF("k")
        .select(col("k"), addr3("c9", 900L, "G1").as("a"))
        .createOrReplaceTempView("ne_src")
      val e = intercept[Exception](spark.sql("""
        MERGE INTO graft.ne_t t USING ne_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *"""))
      assert(e.getMessage.contains("SCHEMA EVOLUTION"), e.getMessage)
      spark.sql("""
        MERGE WITH SCHEMA EVOLUTION INTO graft.ne_t t
        USING ne_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql("SELECT a.geo FROM graft.ne_t WHERE k = 1")
        .as[Option[String]].head() == Some("G1"))
    } finally graft.plans.GraftSqlTables.clear()
  }

  test("two-level nesting widens through both depths") {
    val t = freshTable()
    def deep(tag: String) = struct(lit(tag).as("tag"),
      struct(lit(1L).as("x")).as("inner"))
    def deep2(tag: String) = struct(lit(tag).as("tag"),
      struct(lit(2L).as("x"), lit("NEW").as("y")).as("inner"))
    MiniDelta.append(spark,
      Seq(1L).toDF("k").select(col("k"), deep("t1").as("d")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark,
      Seq(2L).toDF("k").select(col("k"), deep2("t2").as("d")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("d.inner.x"), col("d.inner.y"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(out == Set((1L, 1L, None), (2L, 2L, Some("NEW"))))
  }
}
