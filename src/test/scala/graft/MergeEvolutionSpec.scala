package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.io.MiniDelta.{MergeBySourceClause, MergeInsertClause, MergeMatchedClause}
import graft.plans.GraftSqlTables

/** Schema evolution through the GENERAL MERGE (r16 — Delta's
  * `WITH SCHEMA EVOLUTION` on the full clause matrix): SET/INSERT
  * targets naming columns the table has not declared APPEND them,
  * types inferred from the assignment expressions, one metaData
  * action in the merge's own commit. Composes with both storage forms
  * (CoW rewrite, DV mask+append), column mapping (fresh
  * physicalName/ids ratcheted) and identity chains (the SAME line
  * carries the advanced mark). Without the flag, unknown targets
  * refuse by name exactly as before. */
class MergeEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("mrgevo").toString + "/t"

  private def metaLines(t: String, v: Long): Seq[String] =
    Files.readString(java.nio.file.Paths.get(
      f"$t/_delta_log/$v%020d.json")).linesIterator
      .filter(_.contains("\"metaData\"")).toSeq

  private def seed(t: String): Unit = {
    MiniDelta.append(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "n"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
  }

  test("unknown SET/INSERT targets refuse without the flag, append " +
      "with it — one metaData action") {
    val t = freshTable(); seed(t)
    val src = Seq((2L, "B", 5L), (9L, "i", 90L)).toDF("k", "v", "bonus")
    def clauses = (
      Seq(MergeMatchedClause(None,
        Some(Map("v" -> col("__src_v"), "score" -> (col("__src_bonus") * 2))))),
      Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "v" -> col("v"), "score" -> col("bonus")))))
    val (m, i) = clauses
    val e = intercept[IllegalArgumentException](
      MiniDelta.mergeClauses(spark, t, src, Seq("k"), m, i, Seq.empty,
        Seq.empty))
    assert(e.getMessage.contains("SCHEMA"), e.getMessage)
    val ver = MiniDelta.mergeClauses(spark, t, src, Seq("k"), m, i,
      Seq.empty, Seq.empty, evolveSchema = true)
    assert(metaLines(t, ver).length == 1)
    MiniDelta.invalidateSnapshot(t)
    val sch = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get
    assert(sch.fieldNames.toSeq == Seq("k", "v", "n", "score"))
    assert(sch("score").dataType ==
      org.apache.spark.sql.types.LongType)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("k", "v", "n", "score")
      .as[(Long, String, Option[Long], Option[Long])].collect().toSet
    assert(out == Set(
      (1L, "a", Some(10L), None),          // untouched, null-fills
      (2L, "B", Some(20L), Some(10L)),     // update: score = 5 * 2
      (3L, "c", Some(30L), None),
      (9L, "i", None, Some(90L))))         // insert: n omitted -> null
  }

  test("SQL WITH SCHEMA EVOLUTION: explicit new-column SET + INSERT *") {
    val dir = Files.createTempDirectory("mrgevosql").toString
    GraftSqlTables.clear()
    spark.sql(s"""
      CREATE TABLE graft.evo_t (k BIGINT, v STRING)
      LOCATION '$dir/t'""")
    try {
      spark.sql("INSERT INTO graft.evo_t VALUES (1, 'a'), (2, 'b')")
      Seq((1L, "A", 7L), (5L, "e", 50L)).toDF("k", "v", "w")
        .createOrReplaceTempView("evo_src")
      // without the flag the general path refuses the unknown target
      val e = intercept[Exception](spark.sql("""
        MERGE INTO graft.evo_t t USING evo_src s ON t.k = s.k
        WHEN MATCHED AND s.w > 0 THEN UPDATE SET v = s.v, w = s.w
        WHEN NOT MATCHED THEN INSERT *
      """))
      assert(e.getMessage.contains("unknown column w"), e.getMessage)
      spark.sql("""
        MERGE WITH SCHEMA EVOLUTION INTO graft.evo_t t
        USING evo_src s ON t.k = s.k
        WHEN MATCHED AND s.w > 0 THEN UPDATE SET v = s.v, w = s.w
        WHEN NOT MATCHED THEN INSERT *
      """)
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql("SELECT k, v, w FROM graft.evo_t")
        .as[(Long, String, Option[Long])].collect().toSet == Set(
        (1L, "A", Some(7L)), (2L, "b", None), (5L, "e", Some(50L))))
    } finally GraftSqlTables.clear()
  }

  test("evolution composes with the DV storage form") {
    val t = freshTable()
    MiniDelta.createTable(spark, t,
      Seq((0L, "z", 0L)).toDF("k", "v", "n").schema,
      properties = Map("delta.enableDeletionVectors" -> "true"))
    // ONE multi-row file: masking k=1 must leave it partially-live
    // (a fully-doomed single-row file is dropped whole, no DV)
    MiniDelta.append(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "n").coalesce(1), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val ver = MiniDelta.mergeClauses(spark, t,
      Seq((1L, 100L), (8L, 800L)).toDF("k", "extra"), Seq("k"),
      matched = Seq(MergeMatchedClause(None,
        Some(Map("extra" -> col("__src_extra"))))),
      notMatched = Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "extra" -> col("extra")))),
      bySource = Seq.empty, partitionBy = Seq.empty,
      evolveSchema = true)
    assert(metaLines(t, ver).length == 1)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("k", "v", "extra")
      .as[(Long, Option[String], Option[Long])].collect().toSet
    assert(out == Set(
      (1L, Some("a"), Some(100L)), (2L, Some("b"), None),
      (3L, Some("c"), None), (8L, None, Some(800L))))
    // the update really took the DV path: the original file is masked,
    // not rewritten (its add action still stands with a dv descriptor)
    val dvs = MiniDelta.snapshotFiles(spark, t)
      .where(col("dv_path").isNotNull).count()
    assert(dvs >= 1, "expected a deletion-vector mask, got a rewrite")
  }

  test("identity table: the SAME metaData line carries the evolved " +
      "schema and the advanced mark") {
    val t = freshTable()
    import org.apache.spark.sql.types._
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true, new MetadataBuilder()
        .putLong("delta.identity.start", 1L)
        .putLong("delta.identity.step", 1L).build()),
      StructField("k", LongType),
      StructField("v", StringType))))
    MiniDelta.append(spark, Seq((10L, "a"), (20L, "b")).toDF("k", "v"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val ver = MiniDelta.mergeClauses(spark, t,
      Seq((20L, "B", 2L), (30L, "c", 3L)).toDF("k", "v", "rank"),
      Seq("k"),
      matched = Seq(MergeMatchedClause(None,
        Some(Map("v" -> col("__src_v"), "rank" -> col("__src_rank"))))),
      notMatched = Seq(MergeInsertClause(None, Map(
        "k" -> col("k"), "v" -> col("v"), "rank" -> col("rank")))),
      bySource = Seq.empty, partitionBy = Seq.empty,
      evolveSchema = true)
    val ml = metaLines(t, ver)
    assert(ml.length == 1, s"expected ONE metaData action, got $ml")
    assert(ml.head.contains("rank") &&
      ml.head.contains("delta.identity.highWaterMark"))
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "k", "v", "rank")
      .as[(Long, Long, String, Option[Long])].collect().toSet
    assert(out == Set((1L, 10L, "a", None), (2L, 20L, "B", Some(2L)),
      (3L, 30L, "c", Some(3L))))
  }

  test("mapped table: evolved columns get physicalName/id, " +
      "maxColumnId ratchets; by-source SET evolves too") {
    val t = freshTable()
    import org.apache.spark.sql.types._
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val ver = MiniDelta.mergeClauses(spark, t,
      Seq((1L, "A")).toDF("k", "v"), Seq("k"),
      matched = Seq(MergeMatchedClause(None,
        Some(Map("v" -> col("__src_v"))))),
      notMatched = Seq.empty,
      bySource = Seq(MergeBySourceClause(None,
        Some(Map("status" -> lit("stale"))))),
      partitionBy = Seq.empty, evolveSchema = true)
    assert(metaLines(t, ver).length == 1)
    MiniDelta.invalidateSnapshot(t)
    val sch = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get
    val st = sch("status")
    assert(st.metadata.contains("delta.columnMapping.physicalName") &&
      st.metadata.getLong("delta.columnMapping.id") == 3L)
    assert(MiniDelta.tableConfig(spark, t)(
      "delta.columnMapping.maxColumnId") == "3")
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("k", "v", "status")
      .as[(Long, String, Option[String])].collect().toSet
    assert(out == Set((1L, "A", None), (2L, "b", Some("stale"))))
  }

  test("a CDF window spanning the evolution reads under the evolved " +
      "schema; pre-evolution changes null-fill") {
    val t = freshTable()
    MiniDelta.createTable(spark, t,
      Seq((0L, "z")).toDF("k", "v").schema,
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    MiniDelta.append(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      t, Seq.empty) // v1: inserts, pre-evolution
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.mergeClauses(spark, t,
      Seq((1L, "A", 9L), (5L, "e", 50L)).toDF("k", "v", "w"), Seq("k"),
      matched = Seq(MergeMatchedClause(None,
        Some(Map("v" -> col("__src_v"), "w" -> col("__src_w"))))),
      notMatched = Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "v" -> col("v"), "w" -> col("w")))),
      bySource = Seq.empty, partitionBy = Seq.empty,
      evolveSchema = true) // v2: the evolving merge
    MiniDelta.invalidateSnapshot(t)
    val feed = MiniDelta.readCdf(spark, t, 0L)
      .select("k", "w", "_change_type", "_commit_version")
      .as[(Long, Option[Long], String, Long)].collect().toSet
    assert(feed == Set(
      (1L, None, "insert", 1L),              // pre-evolution: w nulls
      (2L, None, "insert", 1L),
      (1L, None, "update_preimage", 2L),     // preimage predates w
      (1L, Some(9L), "update_postimage", 2L),
      (5L, Some(50L), "insert", 2L)), feed)
  }

  test("evolution composes with Hive partitioning: rewrites stay in " +
      "their directories, inserts land partitioned") {
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "x", 10L), (2L, "x", 20L), (3L, "y", 30L))
        .toDF("k", "p", "n"), t, Seq("p"))
    MiniDelta.invalidateSnapshot(t)
    val ver = MiniDelta.mergeClauses(spark, t,
      Seq((2L, "x", 99L), (9L, "y", 90L)).toDF("k", "p", "tag"),
      Seq("k"),
      matched = Seq(MergeMatchedClause(None,
        Some(Map("tag" -> col("__src_tag"))))),
      notMatched = Seq(MergeInsertClause(None, Map(
        "k" -> col("k"), "p" -> col("p"), "tag" -> col("tag")))),
      bySource = Seq.empty, partitionBy = Seq("p"),
      evolveSchema = true)
    assert(Files.readString(java.nio.file.Paths.get(
      f"$t/_delta_log/$ver%020d.json")).linesIterator
      .count(_.contains("\"metaData\"")) == 1)
    MiniDelta.invalidateSnapshot(t)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("k", "p", "n", "tag")
      .as[(Long, String, Option[Long], Option[Long])].collect().toSet
    assert(out == Set(
      (1L, "x", Some(10L), None), (2L, "x", Some(20L), Some(99L)),
      (3L, "y", Some(30L), None), (9L, "y", None, Some(90L))))
    // partition pruning still works post-evolution: reading p=y scans
    // only that directory's files
    val yRows = MiniDelta.readFiltered(spark, t,
      Seq(Map("p" -> "y"))).count()
    assert(yRows == 2L)
  }

  test("conflicting inferred types refuse loudly") {
    val t = freshTable(); seed(t)
    val src = Seq((2L, 5L), (9L, 90L)).toDF("k", "bonus")
    val e = intercept[IllegalArgumentException](
      MiniDelta.mergeClauses(spark, t, src, Seq("k"),
        matched = Seq(MergeMatchedClause(None,
          Some(Map("w" -> col("__src_bonus"))))),        // LONG
        notMatched = Seq(MergeInsertClause(None,
          Map("k" -> col("k"), "w" -> lit("text")))),    // STRING
        bySource = Seq.empty, partitionBy = Seq.empty,
        evolveSchema = true))
    assert(e.getMessage.contains("conflicting types"), e.getMessage)
  }

  test("cross-clause nested widening UNIONS each clause's new fields; " +
      "non-composable clause shapes refuse by name") {
    // r17 (the cands.head fix): an existing struct column's evolved
    // type is the COMPOSITION of every clause's assignment type — two
    // clauses growing different nested fields union them; a clause
    // whose shape cannot compose refuses with the column named, never
    // an opaque positional struct-cast failure downstream
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "c1"), (2L, "c2")).toDF("k", "city")
        .select(col("k"), struct(col("city")).as("a")), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val src = Seq((2L, "u2", 20L, "G2"), (9L, "u9", 90L, "G9"))
      .toDF("k", "city", "zip", "geo")
    MiniDelta.mergeClauses(spark, t, src, Seq("k"),
      matched = Seq(MergeMatchedClause(None, Some(Map(
        "a" -> struct(col("__src_city").as("city"),
          col("__src_zip").as("zip")))))),
      notMatched = Seq(MergeInsertClause(None, Map(
        "k" -> col("k"),
        "a" -> struct(col("city").as("city"),
          col("geo").as("geo"))))),
      bySource = Seq.empty, partitionBy = Seq.empty,
      evolveSchema = true)
    MiniDelta.invalidateSnapshot(t)
    val aT = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get("a").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(aT.fieldNames.toSeq == Seq("city", "zip", "geo"),
      aT.fieldNames.mkString(","))
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("a.city"), col("a.zip"), col("a.geo"))
      .as[(Long, String, Option[Long], Option[String])].collect().toSet
    assert(out == Set(
      (1L, "c1", None, None),
      (2L, "u2", Some(20L), None),
      (9L, "u9", None, Some("G9"))), out)
    // non-composable: one clause widens zip as LONG, the other
    // declares it STRING — the fold refuses naming the column
    val t2 = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "c1")).toDF("k", "city")
        .select(col("k"), struct(col("city")).as("a")), t2, Seq.empty)
    MiniDelta.invalidateSnapshot(t2)
    val e = intercept[IllegalArgumentException](
      MiniDelta.mergeClauses(spark, t2, src, Seq("k"),
        matched = Seq(MergeMatchedClause(None, Some(Map(
          "a" -> struct(col("__src_city").as("city"),
            col("__src_zip").as("zip")))))),              // zip LONG
        notMatched = Seq(MergeInsertClause(None, Map(
          "k" -> col("k"),
          "a" -> struct(col("city").as("city"),
            lit("z").as("zip"))))),                       // zip STRING
        bySource = Seq.empty, partitionBy = Seq.empty,
        evolveSchema = true))
    assert(e.getMessage.contains("conflicting types"), e.getMessage)
  }

  test("a differently-CASED source column MATCHES the declared one " +
      "(never appends a case-duplicate); case-dup NEW columns refuse") {
    // Spark's default resolution is case-insensitive — an evolving
    // append whose source spells `N` for declared `n` must match it,
    // or the evolved schema would hold two columns Spark can no
    // longer resolve unambiguously (and delta-spark would reject)
    val t = freshTable(); seed(t)
    val v = MiniDelta.append(spark,
      Seq((4L, "d", 40L, 1.5)).toDF("k", "v", "N", "extra"),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val sch = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get
    assert(sch.fieldNames.toSeq == Seq("k", "v", "n", "extra"),
      sch.fieldNames.mkString(","))
    assert(metaLines(t, v).length == 1)
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("k") === 4L).select("n", "extra")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((40L, 1.5)))
    // two spellings of one NEW column in the same frame refuse: the
    // evolved schema would be unresolvable
    import org.apache.spark.sql.types._
    val dupFrame = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(9L, 1L, 2L)),
      StructType(Seq(StructField("k", LongType),
        StructField("w", LongType), StructField("W", LongType))))
    val e = intercept[IllegalArgumentException](
      MiniDelta.append(spark, dupFrame, t, Seq.empty))
    assert(e.getMessage.contains("case-duplicate"), e.getMessage)
    // and through MERGE: the cased source column UPDATES the declared
    // one rather than evolving a duplicate
    val src = Seq((2L, 99L)).toDF("k", "N")
    MiniDelta.merge(spark, t, src, Seq("k"), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val sch2 = MiniDelta.latestSchema(spark, t,
      MiniDelta.latestVersion(spark, t)).get
    assert(sch2.fieldNames.toSeq == Seq("k", "v", "n", "extra"))
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("k") === 2L).select("n").head().getLong(0) == 99L)
  }

  test("evolving merge WIDENS a nested field of a COLUMN-MAPPED " +
      "table: widening + deep physicalName preservation in one " +
      "commit (r18 — the last evolution-matrix seam)") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("meta", StructType(Seq(
        StructField("v", IntegerType),
        StructField("w", StringType)))))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark,
      Seq((1L, 10, "a"), (2L, 20, "b")).toDF("k", "v", "w")
        .select(col("k"), struct(col("v"), col("w")).as("meta")),
      t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val physBefore = MiniDelta.latestSchema(spark, t).get("meta")
      .dataType.asInstanceOf[StructType]("v").metadata
      .getString("delta.columnMapping.physicalName")
    // the source assigns meta with v LONG (wider) and a NEW field z
    val src = Seq((2L, 99L, "B", 7L), (9L, 900L, "I", 70L))
      .toDF("k", "v", "w", "z")
    val ver = MiniDelta.mergeClauses(spark, t, src, Seq("k"),
      matched = Seq(MergeMatchedClause(None, Some(Map(
        "meta" -> struct(col("__src_v").as("v"), col("__src_w").as("w"),
          col("__src_z").as("z")))))),
      notMatched = Seq(MergeInsertClause(None, Map(
        "k" -> col("k"),
        "meta" -> struct(col("v"), col("w"), col("z"))))),
      bySource = Seq.empty, partitionBy = Seq.empty,
      evolveSchema = true)
    assert(metaLines(t, ver).length == 1) // ONE commit carries it all
    MiniDelta.invalidateSnapshot(t)
    val mT = MiniDelta.latestSchema(spark, t).get("meta").dataType
      .asInstanceOf[StructType]
    assert(mT("v").dataType == LongType, mT("v").dataType.toString)
    // the widened field keeps pointing at its stored bytes
    assert(mT("v").metadata
      .getString("delta.columnMapping.physicalName") == physBefore)
    // the NEW nested field got fresh mapping metadata at depth
    assert(mT("z").metadata.contains("delta.columnMapping.physicalName"))
    val out = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("k"), col("meta.v"), col("meta.z"))
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 10L, None),        // untouched narrow bytes upcast
      (2L, 99L, Some(7L)),
      (9L, 900L, Some(70L))), out.toString)
    // TOP-LEVEL scalar mismatches keep cast-at-write: an evolving
    // merge assigning a LONG expression to a declared INT column must
    // NOT silently retype it (widening a plain column has its own
    // explicit verb and would attach the reader-blocking typeWidening
    // feature as a side effect)
    val ts = freshTable()
    MiniDelta.append(spark,
      Seq((1L, 10)).toDF("k", "n")
        .select(col("k"), col("n").cast("int").as("n")), ts, Seq.empty)
    MiniDelta.invalidateSnapshot(ts)
    MiniDelta.mergeClauses(spark, ts,
      Seq((1L, 99L)).toDF("k", "n"), Seq("k"),
      matched = Seq(MergeMatchedClause(None,
        Some(Map("n" -> col("__src_n"))))),
      notMatched = Seq.empty, bySource = Seq.empty,
      partitionBy = Seq.empty, evolveSchema = true)
    MiniDelta.invalidateSnapshot(ts)
    val sch3 = MiniDelta.latestSchema(spark, ts).get
    assert(sch3("n").dataType ==
      org.apache.spark.sql.types.IntegerType, sch3("n").dataType)
    assert(MiniDelta.readFiltered(spark, ts, Seq.empty)
      .select("n").head().getInt(0) == 99)
  }
}
