package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.io.MiniDelta.{MergeBySourceClause, MergeInsertClause, MergeMatchedClause}
import graft.plans.GraftSqlTables

/** The GENERAL MERGE ([[MiniDelta.mergeClauses]] + the SQL clause
  * translation): any combination of conditional matched UPDATE/DELETE,
  * not-matched INSERT, and not-matched-by-source UPDATE/DELETE
  * clauses, first-applicable-clause-wins per row — the full Delta
  * clause matrix beyond the three dedicated fast paths. The reference
  * has no MERGE at all (its writes are PUT-shaped, main.rs:941); the
  * semantics here follow the Delta/SQL-standard MERGE contract. */
class MergeClausesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("mrgcl").toString + "/t"

  private def rows(t: String): Set[(Long, String, Long)] =
    MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("k", "v", "n").as[(Long, String, Long)].collect().toSet

  test("full clause matrix: cond update, cond delete, insert, sync") {
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "keep", 10L), (2L, "upd", 20L), (3L, "del", 30L),
        (4L, "stale", 40L), (5L, "still", 50L))
        .toDF("k", "v", "n"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val src = Seq((1L, "keep2", 0L), (2L, "UPDATED", 99L),
      (3L, "any", 0L), (6L, "new", 60L), (7L, "skipme", -1L))
      .toDF("k", "v", "n")
    // k=1 matches but fails both matched conds -> passes through;
    // k=2 hits the update; k=3 hits the delete; k=6 inserts; k=7
    // fails the insert cond -> dropped; k=4 (stale) sync-deletes;
    // k=5 survives the by-source cond
    MiniDelta.mergeClauses(spark, t, src, Seq("k"),
      matched = Seq(
        MergeMatchedClause(Some(col("__src_v") === "any"), None), // DELETE
        MergeMatchedClause(Some(col("__src_n") > 50L),
          Some(Map("v" -> col("__src_v"), "n" -> (col("n") + col("__src_n")))))),
      notMatched = Seq(
        MergeInsertClause(Some(col("n") >= 0L),
          Map("k" -> col("k"), "v" -> col("v"), "n" -> col("n")))),
      bySource = Seq(
        MergeBySourceClause(Some(col("v") === "stale"), None)), // DELETE
      partitionBy = Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(rows(t) == Set(
      (1L, "keep", 10L),      // matched, no clause fired
      (2L, "UPDATED", 119L),  // update: n = 20 + 99 (pre-update pair)
      (5L, "still", 50L),     // unmatched by source, cond false
      (6L, "new", 60L)))      // insert
  }

  test("first applicable clause wins; unassigned columns keep values") {
    val t = freshTable()
    MiniDelta.append(spark, Seq((1L, "a", 1L), (2L, "b", 2L))
      .toDF("k", "v", "n"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val src = Seq((1L, "x", 100L), (2L, "y", 200L)).toDF("k", "v", "n")
    // both rows satisfy BOTH clauses; the FIRST (partial assignment)
    // must win — v updates, n keeps its stored value
    MiniDelta.mergeClauses(spark, t, src, Seq("k"),
      matched = Seq(
        MergeMatchedClause(None, Some(Map("v" -> col("__src_v")))),
        MergeMatchedClause(None,
          Some(Map("v" -> lit("LOSER"), "n" -> lit(-1L))))),
      notMatched = Nil, bySource = Nil, partitionBy = Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(rows(t) == Set((1L, "x", 1L), (2L, "y", 2L)))
  }

  test("SQL: qualifiers bind, conditions see both sides, sync update") {
    val dir = Files.createTempDirectory("mrgclsql").toString
    GraftSqlTables.clear()
    spark.sql(s"""
      CREATE TABLE graft.mc_t (k BIGINT, v STRING, n BIGINT)
      LOCATION '$dir/t'""")
    try {
      spark.sql("INSERT INTO graft.mc_t VALUES " +
        "(1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
      Seq((1L, "A", 5L), (2L, "b", 0L), (9L, "i", 90L))
        .toDF("k", "v", "n").createOrReplaceTempView("mc_src")
      // k=1: v differs -> update (n sums both sides); k=2: v equal ->
      // falls to DELETE; k=9 inserts with an expression; k=3 unmatched
      // by source -> marked
      spark.sql("""
        MERGE INTO graft.mc_t t USING mc_src s ON t.k = s.k
        WHEN MATCHED AND t.v <> s.v THEN UPDATE SET v = s.v, n = t.n + s.n
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, upper(s.v), s.n * 2)
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'
      """)
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql("SELECT k, v, n FROM graft.mc_t")
        .as[(Long, String, Long)].collect().toSet == Set(
        (1L, "A", 15L), (3L, "stale", 30L), (9L, "I", 180L)))
      // UPDATE SET * with a condition routes general too
      Seq((1L, "z", 1L)).toDF("k", "v", "n")
        .createOrReplaceTempView("mc_src2")
      spark.sql("""
        MERGE INTO graft.mc_t t USING mc_src2 s ON t.k = s.k
        WHEN MATCHED AND s.n = 1 THEN UPDATE SET *
      """)
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql("SELECT v FROM graft.mc_t WHERE k = 1")
        .as[String].head() == "z")
      // a matched DELETE whose condition reads the SOURCE also routes
      // general (the fast path binds target columns only)
      spark.sql("""
        MERGE INTO graft.mc_t t USING mc_src2 s ON t.k = s.k
        WHEN MATCHED AND s.v = 'z' THEN DELETE
      """)
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql("SELECT k FROM graft.mc_t")
        .as[Long].collect().toSet == Set(3L, 9L))
    } finally GraftSqlTables.clear()
  }

  test("DV form masks, CDF feeds the exact split, partitions compose") {
    val dir = Files.createTempDirectory("mrgcldv").toString
    GraftSqlTables.clear()
    spark.sql(s"""
      CREATE TABLE graft.mc_dv (k BIGINT, v STRING, n BIGINT)
      PARTITIONED BY (p STRING) LOCATION '$dir/t'
      TBLPROPERTIES ('delta.enableDeletionVectors' = 'true',
        'delta.enableChangeDataFeed' = 'true')""")
    try {
      // coalesce(1) so each partition dir lands ONE multi-row file —
      // masking must leave the file alive (partially-live), the DV
      // form's whole point
      MiniDelta.append(spark,
        Seq((1L, "a", 10L, "x"), (2L, "b", 20L, "x"),
          (5L, "e", 50L, "x"), (3L, "c", 30L, "y"))
          .toDF("k", "v", "n", "p").coalesce(1),
        s"$dir/t", Seq("p"))
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val preFiles = MiniDelta.snapshotFiles(spark, s"$dir/t")
        .select("path").collect().map(_.getString(0)).toSet
      Seq((1L, "A", 1L, "x"), (4L, "d", 40L, "y"))
        .toDF("k", "v", "n", "p").createOrReplaceTempView("mc_dvsrc")
      val v0 = MiniDelta.latestVersion(spark, s"$dir/t")
      spark.sql("""
        MERGE INTO graft.mc_dv t USING mc_dvsrc s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v, n, p) VALUES (s.k, s.v, s.n, s.p)
        WHEN NOT MATCHED BY SOURCE AND t.k = 2 THEN DELETE
      """)
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql("SELECT k, v FROM graft.mc_dv")
        .as[(Long, String)].collect().toSet ==
        Set((1L, "A"), (3L, "c"), (4L, "d"), (5L, "e")))
      // DV form: the original files survive MASKED (k=1 updated and
      // k=2 deleted ride the x-file's deletion vector; k=5 keeps it
      // partially live), never rewritten
      val snap2 = MiniDelta.snapshotFiles(spark, s"$dir/t")
        .select("path", "dv_path").collect()
      val postFiles = snap2.map(_.getString(0)).toSet
      assert(preFiles.subsetOf(postFiles), (preFiles, postFiles))
      assert(snap2.exists(r => !r.isNullAt(1)), snap2.toSeq)
      // CDF: exact update-pre/post + delete + insert rows (the window
      // is (from, to])
      val v1 = MiniDelta.latestVersion(spark, s"$dir/t")
      val feed = MiniDelta.readCdf(spark, s"$dir/t", v0, v1)
        .select("k", "v", "_change_type")
        .as[(Long, String, String)].collect().toSet
      assert(feed == Set(
        (1L, "a", "update_preimage"), (1L, "A", "update_postimage"),
        (2L, "b", "delete"), (4L, "d", "insert")), feed)
    } finally GraftSqlTables.clear()
  }

  test("inserts fill DEFAULTs and compute generated; updates recompute") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    def meta(kv: (String, String)) = new MetadataBuilder()
      .putString(kv._1, kv._2).build()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("k", LongType),
      StructField("n", LongType),
      StructField("tag", StringType, nullable = true,
        meta("CURRENT_DEFAULT" -> "'t0'")),
      StructField("dbl", LongType, nullable = true,
        meta("delta.generationExpression" -> "n * 2")))))
    MiniDelta.append(spark, Seq((1L, 10L)).toDF("k", "n"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val src = Seq((1L, 11L), (2L, 20L)).toDF("k", "n")
    MiniDelta.mergeClauses(spark, t, src, Seq("k"),
      matched = Seq(MergeMatchedClause(None,
        Some(Map("n" -> col("__src_n"))))),
      notMatched = Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "n" -> col("n")))),
      bySource = Nil, partitionBy = Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // generated recomputes on the update (11*2) and computes on the
    // insert (20*2); the DEFAULT fills the omitted insert column and
    // the update keeps the stored value
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("k", "n", "tag", "dbl").as[(Long, Long, String, Long)]
      .collect().toSet == Set((1L, 11L, "t0", 22L), (2L, 20L, "t0", 40L)))
  }

  test("refusal matrix") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.append(spark, Seq((1L, "a")).toDF("k", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // duplicate source keys with ANY matched clause are ambiguous in
    // the general form — conditions may reference source columns, so
    // two pairs can disagree (the delete-only FAST path stays
    // duplicate-tolerant: its conditions bind target columns only)
    val dupSrc = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val de = intercept[IllegalArgumentException](
      MiniDelta.mergeClauses(spark, t, dupSrc, Seq("k"),
        Seq(MergeMatchedClause(None, Some(Map("v" -> col("__src_v"))))),
        Nil, Nil, Seq.empty))
    assert(de.getMessage.contains("duplicate"), de.getMessage)
    val dd = intercept[IllegalArgumentException](
      MiniDelta.mergeClauses(spark, t, dupSrc, Seq("k"),
        Seq(MergeMatchedClause(Some(col("__src_v") === "x"), None)),
        Nil, Nil, Seq.empty))
    assert(dd.getMessage.contains("duplicate"), dd.getMessage)
    // by-source / insert-only clause sets tolerate duplicates (no pair
    // ambiguity exists)
    MiniDelta.mergeClauses(spark, t, dupSrc, Seq("k"),
      Nil, Nil, Seq(MergeBySourceClause(Some(lit(false)), None)),
      Seq.empty)
    // unknown assignment target
    val ue = intercept[IllegalArgumentException](
      MiniDelta.mergeClauses(spark, t, Seq((1L, "x")).toDF("k", "v"),
        Seq("k"),
        Seq(MergeMatchedClause(None, Some(Map("nope" -> lit(1))))),
        Nil, Nil, Seq.empty))
    assert(ue.getMessage.contains("nope"), ue.getMessage)
    // generated column assignment refuses
    val g = freshTable()
    MiniDelta.createTable(spark, g, StructType(Seq(
      StructField("k", LongType),
      StructField("h", LongType, nullable = true,
        new MetadataBuilder()
          .putString("delta.generationExpression", "k * 2").build()))))
    val ge = intercept[IllegalArgumentException](
      MiniDelta.mergeClauses(spark, g, Seq(1L).toDF("k"), Seq("k"),
        Seq(MergeMatchedClause(None, Some(Map("h" -> lit(1L))))),
        Nil, Nil, Seq.empty))
    assert(ge.getMessage.contains("generated"), ge.getMessage)
    // GENERATED ALWAYS identity: an INSERT clause PROVIDING the column
    // refuses (omitting it assigns the chain — see the identity test)
    val i = freshTable()
    MiniDelta.createTable(spark, i, StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder().putLong("delta.identity.start", 1L)
          .putLong("delta.identity.step", 1L)
          .putBoolean("delta.identity.allowExplicitInsert", false).build()),
      StructField("k", LongType))))
    val ie = intercept[IllegalArgumentException](
      MiniDelta.mergeClauses(spark, i, Seq(1L).toDF("k"), Seq("k"),
        Nil, Seq(MergeInsertClause(None,
          Map("id" -> lit(99L), "k" -> col("k")))), Nil,
        Seq.empty))
    assert(ie.getMessage.contains("GENERATED ALWAYS"), ie.getMessage)
  }

  test("identity columns assign on INSERT clauses through the chain") {
    import org.apache.spark.sql.types._
    // GENERATED ALWAYS: clauses omit the column, fresh values land
    // strictly past the mark, and the mark advances IN the same commit
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder().putLong("delta.identity.start", 10L)
          .putLong("delta.identity.step", 10L).build()),
      StructField("k", LongType),
      StructField("v", StringType))))
    MiniDelta.mergeClauses(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"),
      Nil, Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "v" -> col("v")))), Nil, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val r1 = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("k").select("id", "k").as[(Long, Long)].collect()
    assert(r1.map(_._1).toSet == Set(10L, 20L), r1.mkString(","))
    // a SECOND merge continues past the committed mark (proves the
    // metaData line joined the first commit): matched k=2 updates,
    // unmatched k=3 inserts with the next chain value
    MiniDelta.mergeClauses(spark, t,
      Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k"),
      Seq(MergeMatchedClause(None, Some(Map("v" -> col("__src_v"))))),
      Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "v" -> col("v")))), Nil, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val r2 = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("k").select("id", "k", "v").as[(Long, Long, String)]
      .collect()
    assert(r2.toSeq == Seq((10L, 1L, "a"), (20L, 2L, "B"), (30L, 3L, "c")),
      r2.mkString(","))
    // GENERATED BY DEFAULT: a providing clause and an omitting clause
    // compose — provided values keep, the mark syncs over them, and
    // assigned values stay clear of both populations
    val d = freshTable()
    MiniDelta.createTable(spark, d, StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder().putLong("delta.identity.start", 1L)
          .putLong("delta.identity.step", 1L)
          .putBoolean("delta.identity.allowExplicitInsert", true).build()),
      StructField("k", LongType))))
    MiniDelta.mergeClauses(spark, d,
      Seq(5L, 6L).toDF("k"), Seq("k"),
      Nil, Seq(
        MergeInsertClause(Some(col("k") === 5L),
          Map("id" -> lit(100L), "k" -> col("k"))),
        MergeInsertClause(None, Map("k" -> col("k")))), Nil, Seq.empty)
    MiniDelta.invalidateSnapshot(d)
    val rd = MiniDelta.readFiltered(spark, d, Seq.empty)
      .orderBy("k").select("id", "k").as[(Long, Long)].collect()
    assert(rd.find(_._2 == 5L).map(_._1).contains(100L), rd.mkString(","))
    val assigned = rd.find(_._2 == 6L).get._1
    assert(assigned == 1L, s"omitting clause assigns from start: $rd")
    // next merge's assignment clears the synced provided extremum
    MiniDelta.mergeClauses(spark, d,
      Seq(7L).toDF("k"), Seq("k"),
      Nil, Seq(MergeInsertClause(None, Map("k" -> col("k")))), Nil,
      Seq.empty)
    MiniDelta.invalidateSnapshot(d)
    val rd2 = MiniDelta.readFiltered(spark, d, Seq.empty)
      .where(col("k") === 7L).select("id").as[Long].collect()
    assert(rd2.toSeq == Seq(101L),
      s"the mark must have synced past the provided 100: ${rd2.toSeq}")
  }

  test("identity INSERT clauses compose with the DV form") {
    import org.apache.spark.sql.types._
    // the DV form carries the advanced mark through its own commit
    // (writeCommit's idMeta line, not copyOnWrite's extraLines) — the
    // mask + new-image + insert + mark must land atomically
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType, nullable = true,
        new MetadataBuilder().putLong("delta.identity.start", 1L)
          .putLong("delta.identity.step", 1L).build()),
      StructField("k", LongType),
      StructField("v", StringType))),
      properties = Map("delta.enableDeletionVectors" -> "true"))
    // one source partition → one data file, so the matched UPDATE
    // masks one row of a SURVIVING file (a fully-masked file would
    // land as a plain remove, no descriptor)
    MiniDelta.mergeClauses(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), Seq("k"),
      Nil, Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "v" -> col("v")))), Nil, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.mergeClauses(spark, t,
      Seq((2L, "B"), (3L, "c")).toDF("k", "v"), Seq("k"),
      Seq(MergeMatchedClause(None, Some(Map("v" -> col("__src_v"))))),
      Seq(MergeInsertClause(None,
        Map("k" -> col("k"), "v" -> col("v")))), Nil, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val rows = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("k").select("id", "k", "v").as[(Long, Long, String)]
      .collect().toSeq
    // updated row KEEPS its identity; insert extends the chain past
    // the first commit's mark
    assert(rows.map(r => (r._2, r._3)) ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")), rows.mkString(","))
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L), rows.mkString(","))
    // the second merge's update actually took the DV path (a mask
    // descriptor exists), and the chain stayed collision-free
    val masked = MiniDelta.snapshotFiles(spark, t)
      .where(col("dv_path").isNotNull).count()
    assert(masked >= 1, "expected a DV mask from the matched UPDATE")
  }

  test("SQL refusals: by-source source ref, nested target, no-op stays") {
    val dir = Files.createTempDirectory("mrgclref").toString
    GraftSqlTables.clear()
    spark.sql(s"""
      CREATE TABLE graft.mc_r (k BIGINT, v STRING)
      LOCATION '$dir/t'""")
    try {
      spark.sql("INSERT INTO graft.mc_r VALUES (1, 'a')")
      Seq((2L, "b")).toDF("k", "v").createOrReplaceTempView("mc_rsrc")
      val e = intercept[Exception](spark.sql("""
        MERGE INTO graft.mc_r t USING mc_rsrc s ON t.k = s.k
        WHEN NOT MATCHED BY SOURCE AND s.v = 'b' THEN DELETE
      """))
      assert(e.getMessage.contains("BY SOURCE"), e.getMessage)
      // a merge where no clause fires leaves the version unchanged
      val v = MiniDelta.latestVersion(spark, s"$dir/t")
      spark.sql("""
        MERGE INTO graft.mc_r t USING mc_rsrc s ON t.k = s.k
        WHEN MATCHED AND t.v = 'zzz' THEN DELETE
      """)
      assert(MiniDelta.latestVersion(spark, s"$dir/t") == v)
    } finally GraftSqlTables.clear()
  }
}
