package graft

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.plans.GraftSqlTables

/** The SQL front door: `graft.<alias>` identifiers resolve through
  * GraftSqlRule (injected by GraftExtensions in TestSpark) to the
  * governed read/write path — SELECT, time travel, INSERT alignment,
  * the read-only contract, and the raw-parquet-dir guard. */
class SqlAccessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark // built withExtensions(GraftExtensions)
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("sqlaccess").toString

  private def seed(table: String): Unit =
    MiniDelta.append(spark,
      Seq((1L, "XLON", 10.0), (2L, "XPAR", 20.0), (3L, "XLON", 30.0))
        .toDF("id", "mic", "price"),
      table, Seq("mic"))

  test("SELECT resolves graft.<alias> and graft.datalake.<alias>") {
    val t = freshDir() + "/trades"
    seed(t)
    GraftSqlTables.register("spec_sel", t)
    try {
      val n = spark.sql("SELECT count(*) AS n FROM graft.spec_sel")
        .head().getLong(0)
      assert(n == 3)
      val xlon = spark.sql(
        "SELECT sum(price) AS p FROM graft.datalake.spec_sel " +
          "WHERE mic = 'XLON'").head().getDouble(0)
      assert(xlon == 40.0)
    } finally GraftSqlTables.clear()
  }

  test("SQL DDL: CREATE TABLE, CTAS, ADD COLUMNS, DROP TABLE") {
    val root = freshDir()
    try {
      // plain CREATE TABLE through the DSv2 catalog path
      spark.sql(s"""CREATE TABLE graft.spec_ddl
        (id BIGINT, mic STRING, price DOUBLE)
        PARTITIONED BY (mic) LOCATION '$root/ddl'
        TBLPROPERTIES ('delta.appendOnly' = 'false')""")
      assert(MiniDelta.tableExists(spark, s"$root/ddl"))
      // SQL-created aliases are writable: create -> insert -> select
      spark.sql("INSERT INTO graft.spec_ddl VALUES " +
        "(1, 'XLON', 10.0), (2, 'XPAR', 20.0)")
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_ddl")
        .head().getLong(0) == 2)
      // the empty v0 declared the partition layout: inserts land Hive-
      // partitioned and partition pruning applies
      assert(MiniDelta.partitionColumns(spark, s"$root/ddl") == Seq("mic"))
      // IF NOT EXISTS over an existing alias is a no-op, bare refuses
      spark.sql(s"""CREATE TABLE IF NOT EXISTS graft.spec_ddl
        (x INT) LOCATION '$root/other'""")
      intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.spec_ddl (x INT) " +
          s"LOCATION '$root/other2'")
      }
      // ALTER TABLE ADD COLUMNS: metadata commit, old rows null-fill
      spark.sql("ALTER TABLE graft.spec_ddl ADD COLUMNS (qty BIGINT)")
      val got = spark.sql("SELECT id, qty FROM graft.spec_ddl " +
        "ORDER BY id").collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(got.forall(_.isNullAt(1)))
      spark.sql("INSERT INTO graft.spec_ddl VALUES " +
        "(3, 'XLON', 30.0, 7)")
      assert(spark.sql("SELECT qty FROM graft.spec_ddl WHERE id = 3")
        .head().getLong(0) == 7L)
      intercept[Exception] { // case-insensitive collision refused
        spark.sql("ALTER TABLE graft.spec_ddl ADD COLUMNS (MIC STRING)")
      }
      // CTAS: schema + rows from the query (reading a graft alias)
      spark.sql(s"""CREATE TABLE graft.spec_ddl2
        PARTITIONED BY (mic) LOCATION '$root/ddl2'
        AS SELECT id, mic FROM graft.spec_ddl WHERE mic = 'XLON'""")
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_ddl2")
        .head().getLong(0) == 2)
      // DROP TABLE: alias gone (404 on next use), storage intact
      spark.sql("DROP TABLE graft.spec_ddl2")
      val e = intercept[AnalysisException] {
        spark.sql("SELECT * FROM graft.spec_ddl2").collect()
      }
      assert(e.getCondition == "TABLE_OR_VIEW_NOT_FOUND")
      assert(MiniDelta.tableExists(spark, s"$root/ddl2")) // storage kept
      spark.sql("DROP TABLE IF EXISTS graft.never_existed") // no-op
    } finally GraftSqlTables.clear()
  }

  test("SHALLOW CLONE through SQL: zero-copy fork, version pin, refusals") {
    val root = freshDir()
    try {
      val src = s"$root/src"
      seed(src) // v0: 3 rows
      MiniDelta.append(spark,
        Seq((9L, "XAMS", 90.0)).toDF("id", "mic", "price"), src,
        Seq("mic")) // v1: +1 row
      GraftSqlTables.register("sql_cl_src", src) // read-only: clone READS
      val v = spark.sql(s"CREATE TABLE graft.sql_cl_fork SHALLOW CLONE " +
        s"graft.sql_cl_src LOCATION '$root/fork'").head().getLong(0)
      assert(v == 0L)
      assert(spark.sql("SELECT count(*) AS n FROM graft.sql_cl_fork")
        .head().getLong(0) == 4)
      // VERSION AS OF pins the cloned snapshot
      spark.sql(s"CREATE TABLE graft.sql_cl_v0 SHALLOW CLONE " +
        s"graft.sql_cl_src VERSION AS OF 0 LOCATION '$root/v0'")
      assert(spark.sql("SELECT count(*) AS n FROM graft.sql_cl_v0")
        .head().getLong(0) == 3)
      // the fork registers WRITABLE and diverges without touching the
      // source
      spark.sql("INSERT INTO graft.sql_cl_fork VALUES (10, 'XNYS', 1.0)")
      assert(spark.sql("SELECT count(*) AS n FROM graft.sql_cl_fork")
        .head().getLong(0) == 5)
      assert(spark.sql("SELECT count(*) AS n FROM graft.sql_cl_src")
        .head().getLong(0) == 4)
      // an existing target alias refuses; IF NOT EXISTS no-ops
      intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.sql_cl_fork SHALLOW CLONE " +
          s"graft.sql_cl_src LOCATION '$root/fork2'")
      }
      spark.sql(s"CREATE TABLE IF NOT EXISTS graft.sql_cl_fork SHALLOW " +
        s"CLONE graft.sql_cl_src LOCATION '$root/fork3'")
      assert(spark.sql("SELECT count(*) AS n FROM graft.sql_cl_fork")
        .head().getLong(0) == 5)
      // TIMESTAMP AS OF resolves via time travel's at-or-before rule
      // (a future timestamp pins the latest version)
      spark.sql(s"CREATE TABLE graft.sql_cl_ts SHALLOW CLONE " +
        s"graft.sql_cl_src TIMESTAMP AS OF '2099-01-01 00:00:00' " +
        s"LOCATION '$root/ts'")
      assert(spark.sql("SELECT count(*) AS n FROM graft.sql_cl_ts")
        .head().getLong(0) == 4)
      // CONVERT TO DELTA promotes a raw parquet alias in place
      val raw = s"$root/raw"
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(raw)
      GraftSqlTables.register("sql_cl_raw", raw, readOnly = false)
      assert(!MiniDelta.tableExists(spark, raw))
      spark.sql("CONVERT TO DELTA graft.sql_cl_raw")
      assert(MiniDelta.tableExists(spark, raw))
      spark.sql("INSERT INTO graft.sql_cl_raw VALUES (3, 'c')")
      assert(spark.sql("SELECT count(*) AS n FROM graft.sql_cl_raw")
        .head().getLong(0) == 3)
      // foreign syntax falls through to Spark's own parse error
      intercept[Exception] {
        spark.sql("CREATE TABLE other_cat.x SHALLOW CLONE other_cat.y")
      }
    } finally GraftSqlTables.clear()
  }

  test("REORG TABLE APPLY (PURGE) and VACUUM DRY RUN") {
    val root = freshDir()
    val t = s"$root/t"
    try {
      // one multi-row file per partition, so the DELETE masks (a
      // single-row file would be plainly removed — no DV to purge)
      MiniDelta.append(spark,
        Seq((1L, "XLON", 10.0), (2L, "XLON", 20.0), (3L, "XPAR", 30.0))
          .toDF("id", "mic", "price").coalesce(1),
        t, Seq("mic"))
      GraftSqlTables.register("spec_reorg", t, readOnly = false)
      MiniDelta.setTableProperties(spark, t,
        Map("delta.enableDeletionVectors" -> "true"))
      spark.sql("DELETE FROM graft.spec_reorg WHERE id = 1")
      MiniDelta.invalidateSnapshot(t)
      val snap0 = MiniDelta.snapshotFiles(spark, t)
        .select("path", "dv_path").collect()
      val maskedPaths = snap0.filter(!_.isNullAt(1)).map(_.getString(0))
      val cleanPaths = snap0.filter(_.isNullAt(1)).map(_.getString(0)).toSet
      assert(maskedPaths.nonEmpty)
      // REORG rewrites ONLY the masked files; mask-free files keep
      // their exact paths, masks are gone, rows preserved
      // no manual invalidateSnapshot here: the command itself must
      // drop the cached snapshot (a stale manifest naming the
      // superseded DV-masked files + VACUUM RETAIN 0 = broken reads)
      spark.sql("REORG TABLE graft.spec_reorg APPLY (PURGE)")
      val snap1 = MiniDelta.snapshotFiles(spark, t)
        .select("path", "dv_path").collect()
      assert(snap1.forall(_.isNullAt(1)), "REORG left a deletion vector")
      assert(cleanPaths.subsetOf(snap1.map(_.getString(0)).toSet),
        "REORG touched a mask-free file")
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_reorg")
        .head().getLong(0) == 2)
      // the REORG commit is physical, not logical: every action rides
      // dataChange=false (CDF/streaming readers see nothing)
      val reorg = java.nio.file.Files.readString(java.nio.file.Paths.get(
        f"$t/_delta_log/${MiniDelta.latestVersion(spark, t)}%020d.json"))
      assert(!reorg.contains("\"dataChange\":true"), reorg)
      // DRY RUN reports the superseded files without deleting them
      val dr = spark.sql("VACUUM graft.spec_reorg RETAIN 0 HOURS DRY RUN")
        .collect().map(_.getString(0))
      assert(maskedPaths.forall(dr.contains), s"dry run missed: $dr")
      assert(maskedPaths.forall(p =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$t/$p"))),
        "DRY RUN deleted files")
      // the real run (below-horizon check overridden) then deletes them
      spark.conf.set(
        "spark.graft.vacuum.retentionDurationCheck.enabled", "false")
      try spark.sql("VACUUM graft.spec_reorg RETAIN 0 HOURS")
      finally spark.conf.unset(
        "spark.graft.vacuum.retentionDurationCheck.enabled")
      assert(maskedPaths.forall(p =>
        !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$t/$p"))),
        "VACUUM left superseded files")
    } finally GraftSqlTables.clear()
  }

  test("SQL breadth: CREATE OR REPLACE, TRUNCATE, SHOW COLUMNS") {
    val root = freshDir()
    try {
      spark.sql(s"""CREATE TABLE graft.spec_rep
        (id BIGINT, mic STRING, price DOUBLE)
        PARTITIONED BY (mic) LOCATION '$root/rep'""")
      spark.sql("INSERT INTO graft.spec_rep VALUES " +
        "(1, 'XLON', 10.0), (2, 'XPAR', 20.0)")
      // SHOW COLUMNS: the declared logical names, Spark's output shape
      assert(spark.sql("SHOW COLUMNS FROM graft.spec_rep").collect()
        .map(_.getString(0)).toSeq == Seq("id", "mic", "price"))
      // TRUNCATE: contents gone in one metadata commit; schema, layout
      // and HISTORY survive (restore brings the rows back)
      val vBefore = MiniDelta.latestVersion(spark, s"$root/rep")
      spark.sql("TRUNCATE TABLE graft.spec_rep")
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_rep")
        .head().getLong(0) == 0)
      assert(spark.sql("SHOW COLUMNS FROM graft.spec_rep").count() == 3)
      spark.sql(s"RESTORE TABLE graft.spec_rep TO VERSION AS OF $vBefore")
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_rep")
        .head().getLong(0) == 2)
      // CREATE OR REPLACE: schema swap + truncate in ONE commit on the
      // SAME log — no alias re-registration, history intact
      spark.sql("CREATE OR REPLACE TABLE graft.spec_rep (k BIGINT, v STRING)")
      assert(spark.sql("SHOW COLUMNS FROM graft.spec_rep").collect()
        .map(_.getString(0)).toSeq == Seq("k", "v"))
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_rep")
        .head().getLong(0) == 0)
      spark.sql("INSERT INTO graft.spec_rep VALUES (5, 'x')")
      assert(spark.sql("SELECT k FROM graft.spec_rep").head().getLong(0)
        == 5L)
      val ops = spark.sql("DESCRIBE HISTORY graft.spec_rep").collect()
        .map(_.getString(1)).toSeq
      assert(ops.contains("REPLACE TABLE") && ops.contains("TRUNCATE"),
        ops)
      // bare REPLACE on a missing table refuses; OR CREATE creates
      intercept[Exception] {
        spark.sql(s"REPLACE TABLE graft.spec_rep_new (a INT) " +
          s"LOCATION '$root/repnew'")
      }
      spark.sql(s"CREATE OR REPLACE TABLE graft.spec_rep_new (a INT) " +
        s"LOCATION '$root/repnew'")
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_rep_new")
        .head().getLong(0) == 0)
      // SHOW CREATE TABLE renders the re-runnable contract
      val ddl = spark.sql("SHOW CREATE TABLE graft.spec_rep")
        .head().getString(0)
      assert(ddl.contains("CREATE TABLE graft.spec_rep") &&
        ddl.contains("`k` BIGINT") && ddl.contains("`v` STRING") &&
        ddl.contains("USING delta") &&
        ddl.contains(s"$root/rep'"), ddl) // path may be URI-qualified
      // unknown alias falls through to Spark's own resolution error
      intercept[AnalysisException] {
        spark.sql("SHOW COLUMNS FROM graft.not_there").collect()
      }
    } finally GraftSqlTables.clear()
  }

  test("CREATE OR REPLACE TABLE ... AS SELECT swaps contract on one log") {
    val root = freshDir()
    try {
      spark.sql(s"CREATE TABLE graft.spec_rtas (id BIGINT, mic STRING) " +
        s"PARTITIONED BY (mic) LOCATION '$root/rtas'")
      spark.sql(
        "INSERT INTO graft.spec_rtas VALUES (1, 'XLON'), (2, 'XPAR')")
      val vBefore = MiniDelta.latestVersion(spark, s"$root/rtas")
      // RTAS = REPLACE + fill in one statement, intercepted before the
      // DSv2 exec (which would drop the alias registration, then fail
      // createTable's existing-log refusal — statement dead AND the
      // registration lost)
      spark.sql("""CREATE OR REPLACE TABLE graft.spec_rtas
        PARTITIONED BY (tag) AS
        SELECT * FROM VALUES (10L, 'a'), (20L, 'b'), (30L, 'a')
        AS v(k, tag)""")
      assert(spark.sql("SHOW COLUMNS FROM graft.spec_rtas").collect()
        .map(_.getString(0)).toSeq == Seq("k", "tag"))
      assert(spark.sql(
        "SELECT sum(k) AS s FROM graft.spec_rtas WHERE tag = 'a'")
        .head().getLong(0) == 40L)
      // SAME log: the version advanced past the pre-replace head
      // instead of resetting, and the history keeps both eras
      val vAfter = MiniDelta.latestVersion(spark, s"$root/rtas")
      assert(vAfter > vBefore, s"log reset: $vBefore -> $vAfter")
      val ops = spark.sql("DESCRIBE HISTORY graft.spec_rtas").collect()
        .map(_.getString(1)).toSeq
      assert(ops.contains("REPLACE TABLE"), ops)
      // bare RTAS on an unknown alias refuses; the OR CREATE form
      // creates (and registers writable, like CTAS)
      intercept[Exception] {
        spark.sql(s"REPLACE TABLE graft.spec_rtas_new " +
          s"LOCATION '$root/rtasnew' AS SELECT CAST(1 AS BIGINT) AS a")
      }
      spark.sql(s"CREATE OR REPLACE TABLE graft.spec_rtas_new " +
        s"LOCATION '$root/rtasnew' AS SELECT CAST(1 AS BIGINT) AS a")
      assert(spark.sql("SELECT a FROM graft.spec_rtas_new")
        .head().getLong(0) == 1L)
    } finally GraftSqlTables.clear()
  }

  test("self-referential RTAS reads the PRE-replace rows") {
    // CREATE OR REPLACE TABLE t AS SELECT ... FROM t: the query's scan
    // pins the pre-replace file list at ANALYSIS time (before the
    // replace tombstones it), so the fill sees the old rows — the
    // ordering contract GraftReplaceTableAsSelectCommand documents.
    // A lazy read path would make this come back empty; this spec is
    // the regression tripwire.
    val root = freshDir()
    try {
      spark.sql(s"CREATE TABLE graft.spec_selfrtas (k BIGINT, v STRING) " +
        s"LOCATION '$root/selfrtas'")
      spark.sql("INSERT INTO graft.spec_selfrtas VALUES " +
        "(1, 'a'), (2, 'b'), (3, 'c')")
      spark.sql("""CREATE OR REPLACE TABLE graft.spec_selfrtas AS
        SELECT k * 10 AS k10, upper(v) AS vu FROM graft.spec_selfrtas
        WHERE k >= 2""")
      assert(spark.sql("SELECT k10, vu FROM graft.spec_selfrtas ORDER BY k10")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((20L, "B"), (30L, "C")),
        "self-referential RTAS must transform the PRE-replace rows")
      // history keeps both eras on the same log
      val ops = spark.sql("DESCRIBE HISTORY graft.spec_selfrtas").collect()
        .map(_.getString(1)).toSeq
      assert(ops.contains("REPLACE TABLE"), ops)
    } finally GraftSqlTables.clear()
  }

  test("CREATE TABLE refusal matrix: raw dir, bad partition, no location") {
    val root = freshDir()
    try {
      // a path already holding raw parquet would orphan those rows
      Seq((1, "a")).toDF("i", "s").write.parquet(s"$root/raw")
      intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.spec_rawc (i INT, s STRING) " +
          s"LOCATION '$root/raw'")
      }
      assert(GraftSqlTables.resolve(Seq("graft", "spec_rawc")).isEmpty)
      // partition column missing from the schema
      intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.spec_badp (i INT) " +
          s"PARTITIONED BY (nope) LOCATION '$root/badp'")
      }
      // no LOCATION and no warehouse conf
      intercept[Exception] {
        spark.sql("CREATE TABLE graft.spec_noloc (i INT)")
      }
      // with the warehouse conf, the location defaults to <wh>/<alias>
      spark.conf.set("spark.sql.catalog.graft.warehouse", s"$root/wh")
      try {
        spark.sql("CREATE TABLE graft.spec_wh (i INT)")
        assert(MiniDelta.tableExists(spark, s"$root/wh/spec_wh"))
      } finally spark.conf.unset("spark.sql.catalog.graft.warehouse")
    } finally GraftSqlTables.clear()
  }

  test("registry governance: no silent repoint or write-enabling overwrite") {
    val a = freshDir() + "/a"
    val b = freshDir() + "/b"
    try {
      GraftSqlTables.register("spec_gov", a) // read-only default
      GraftSqlTables.register("spec_gov", a) // idempotent: fine
      intercept[IllegalStateException] { // repoint refused
        GraftSqlTables.register("spec_gov", b)
      }
      intercept[IllegalStateException] { // write-enabling refused
        GraftSqlTables.register("spec_gov", a, readOnly = false)
      }
      // explicit unregister re-opens both
      GraftSqlTables.unregister("spec_gov")
      GraftSqlTables.register("spec_gov", b, readOnly = false)
      // tightening to read-only is always allowed
      GraftSqlTables.register("spec_gov", b)
      assert(GraftSqlTables.resolve(Seq("graft", "spec_gov"))
        .exists(_.readOnly))
    } finally GraftSqlTables.clear()
  }

  test("DML target qualifier clashing with a struct column refuses by name") {
    val t = freshDir() + "/trades"
    // table whose top-level column `t` is a struct: DELETE ... AS t
    // WHERE t.f would be ambiguous between qualifier-strip and the
    // struct-field path — must refuse, not guess
    MiniDelta.append(spark,
      Seq((1L, (5L, "x")), (2L, (6L, "y")))
        .toDF("id", "t")
        .select(col("id"), col("t").cast("struct<f:bigint,s:string>")),
      t, Seq.empty)
    GraftSqlTables.register("spec_amb", t, readOnly = false)
    try {
      val e = intercept[IllegalArgumentException] {
        spark.sql("DELETE FROM graft.spec_amb AS t WHERE t.f = 5")
      }
      assert(e.getMessage.contains("ambiguous"), e.getMessage)
      // an unambiguous alias binds the struct path fine
      spark.sql("DELETE FROM graft.spec_amb AS tgt WHERE tgt.t.f = 5")
      assert(spark.sql("SELECT id FROM graft.spec_amb").collect()
        .map(_.getLong(0)).toSeq == Seq(2L))
    } finally GraftSqlTables.clear()
  }

  test("unknown alias falls through to Spark's TABLE_OR_VIEW_NOT_FOUND") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT * FROM graft.no_such_alias").collect()
    }
    assert(e.getCondition == "TABLE_OR_VIEW_NOT_FOUND")
  }

  test("VERSION AS OF pins the snapshot; TIMESTAMP AS OF binds too") {
    val t = freshDir() + "/trades"
    seed(t) // v0
    MiniDelta.append(spark,
      Seq((4L, "XMIL", 40.0)).toDF("id", "mic", "price"), t, Seq("mic"))
    GraftSqlTables.register("spec_tt", t)
    try {
      assert(spark.sql(
        "SELECT count(*) AS n FROM graft.spec_tt VERSION AS OF 0")
        .head().getLong(0) == 3)
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_tt")
        .head().getLong(0) == 4)
      // a far-future literal timestamp sees the latest snapshot
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_tt " +
          "TIMESTAMP AS OF '2100-01-01 00:00:00'")
        .head().getLong(0) == 4)
      val bad = intercept[IllegalArgumentException] {
        spark.sql(
          "SELECT * FROM graft.spec_tt VERSION AS OF 'not_a_number'")
      }
      assert(bad.getMessage.contains("commit number"))
    } finally GraftSqlTables.clear()
  }

  test("INSERT INTO: positional create, BY NAME append, column list") {
    val t = freshDir() + "/trades"
    GraftSqlTables.register("spec_ins", t, readOnly = false)
    try {
      spark.sql("INSERT INTO graft.spec_ins " +
        "SELECT 1L AS id, 'XLON' AS mic, 10.0D AS price")
      // BY NAME with shuffled column order
      spark.sql("INSERT INTO graft.spec_ins BY NAME " +
        "SELECT 20.0D AS price, 2L AS id, 'XPAR' AS mic")
      // explicit column list, also shuffled
      spark.sql("INSERT INTO graft.spec_ins (price, id, mic) " +
        "SELECT 30.0D, 3L, 'XMIL'")
      val rows = spark.sql(
        "SELECT id, mic, price FROM graft.spec_ins ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, "XLON", 10.0), (2L, "XPAR", 20.0),
        (3L, "XMIL", 30.0)))
      // a column list that misses part of the target schema is refused
      val e = intercept[IllegalArgumentException] {
        spark.sql("INSERT INTO graft.spec_ins (id, mic) SELECT 4L, 'XN'")
      }
      assert(e.getMessage.contains("cover the target schema"))
    } finally GraftSqlTables.clear()
  }

  test("INSERT OVERWRITE replaces the snapshot") {
    val t = freshDir() + "/trades"
    seed(t)
    GraftSqlTables.register("spec_ovr", t, readOnly = false)
    try {
      spark.sql("INSERT OVERWRITE graft.spec_ovr " +
        "SELECT 9L AS id, 'XAMS' AS mic, 90.0D AS price")
      val rows = spark.sql(
        "SELECT id, mic, price FROM graft.spec_ovr").collect()
      assert(rows.length == 1 && rows(0).getLong(0) == 9L)
    } finally GraftSqlTables.clear()
  }

  test("read-only registration (the default) rejects INSERT, allows SELECT") {
    val t = freshDir() + "/trades"
    seed(t)
    GraftSqlTables.register("spec_ro", t) // readOnly defaults true
    try {
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_ro")
        .head().getLong(0) == 3)
      intercept[MiniDelta.ReadOnlyTableException] {
        spark.sql("INSERT INTO graft.spec_ro " +
          "SELECT 4L AS id, 'XN' AS mic, 1.0D AS price")
      }
      // nothing landed
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_ro")
        .head().getLong(0) == 3)
    } finally GraftSqlTables.clear()
  }

  test("INSERT into a raw parquet dir is refused; convertToDelta unblocks") {
    val dir = freshDir() + "/raw"
    Seq((1L, "XLON", 10.0), (2L, "XPAR", 20.0)).toDF("id", "mic", "price")
      .write.partitionBy("mic").parquet(dir)
    GraftSqlTables.register("spec_raw", dir, readOnly = false)
    try {
      // SELECT passes through to the raw files
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_raw")
        .head().getLong(0) == 2)
      // INSERT would orphan the existing rows -> refused by name
      val e = intercept[IllegalArgumentException] {
        spark.sql("INSERT INTO graft.spec_raw " +
          "SELECT 3L AS id, 'XMIL' AS mic, 30.0D AS price")
      }
      assert(e.getMessage.contains("_delta_log"))
      // CONVERT TO DELTA folds the existing files into v0; the insert
      // then lands as v1 and the old rows survive. BY NAME because the
      // converted table's declared order puts the partition column last
      // (partition discovery appends it): (id, price, mic).
      MiniDelta.convertToDelta(spark, dir)
      spark.sql("INSERT INTO graft.spec_raw BY NAME " +
        "SELECT 3L AS id, 'XMIL' AS mic, 30.0D AS price")
      val ids = spark.sql("SELECT id FROM graft.spec_raw ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L, 3L))
      // the promoted table keeps its partition layout: the new file
      // lands under mic=XMIL
      assert(MiniDelta.partitionColumns(spark, dir) == Seq("mic"))
    } finally GraftSqlTables.clear()
  }

  test("DELETE, UPDATE and MERGE through SQL") {
    val t = freshDir() + "/trades"
    seed(t) // (1,XLON,10),(2,XPAR,20),(3,XLON,30)
    GraftSqlTables.register("spec_dml", t, readOnly = false)
    try {
      // UPDATE: RHS sees the pre-update row
      spark.sql("UPDATE graft.spec_dml SET price = price + 1.0D " +
        "WHERE mic = 'XLON'")
      assert(spark.sql("SELECT sum(price) AS p FROM graft.spec_dml")
        .head().getDouble(0) == 62.0) // 11 + 20 + 31
      spark.sql("DELETE FROM graft.spec_dml WHERE id = 2L")
      assert(spark.sql("SELECT id FROM graft.spec_dml ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
      // MERGE upsert: id=1 updated, id=9 inserted
      spark.sql("""MERGE INTO graft.spec_dml t USING (
          SELECT 1L AS id, 'XLON' AS mic, 100.0D AS price
          UNION ALL SELECT 9L, 'XAMS', 90.0D) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val rows = spark.sql(
        "SELECT id, mic, price FROM graft.spec_dml ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, "XLON", 100.0), (3L, "XLON", 31.0),
        (9L, "XAMS", 90.0)))
      // MERGE ... WHEN MATCHED [AND cond] THEN DELETE (no insert
      // clause) is the keyed anti-delete (late r13): matched rows
      // satisfying the condition go, the rest survive
      spark.sql("""MERGE INTO graft.spec_dml t USING (
          SELECT 3L AS id UNION ALL SELECT 9L) s
        ON t.id = s.id
        WHEN MATCHED AND t.price < 50.0D THEN DELETE""")
      MiniDelta.invalidateSnapshot(t)
      assert(spark.sql("SELECT id FROM graft.spec_dml ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 9L))
      // NOT MATCHED BY SOURCE DELETE (the sync-delete): sweep target
      // rows absent from the source — only id=1 is named, so 9 goes
      spark.sql("""MERGE INTO graft.spec_dml t USING (
          SELECT 1L AS id) s
        ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
      MiniDelta.invalidateSnapshot(t)
      assert(spark.sql("SELECT id FROM graft.spec_dml ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L))
      // the formerly-refused combination routes through the GENERAL
      // clause path since r14: matched rows delete, unmatched source
      // rows insert (INSERT * requires the source to carry every
      // assignable column)
      spark.sql("""MERGE INTO graft.spec_dml t USING (
          SELECT * FROM VALUES (1L, 'XOFF', 5.0D), (7L, 'XNEW', 7.0D)
          AS v(id, mic, price)) s
        ON t.id = s.id
        WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *""")
      MiniDelta.invalidateSnapshot(t)
      assert(spark.sql("SELECT id FROM graft.spec_dml ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(7L))
      // ... and INSERT * with a source MISSING a target column refuses
      val e = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO graft.spec_dml t USING " +
          "(SELECT 1L AS id) s ON t.id = s.id " +
          "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *")
      }
      assert(e.getMessage.contains("source column"), e.getMessage)
      // DML on a read-only alias refuses before any work
      GraftSqlTables.register("spec_dml_ro", t)
      intercept[MiniDelta.ReadOnlyTableException] {
        spark.sql("DELETE FROM graft.spec_dml_ro WHERE id = 1L")
      }
      intercept[MiniDelta.ReadOnlyTableException] {
        spark.sql("UPDATE graft.spec_dml_ro SET price = 0.0D")
      }
    } finally GraftSqlTables.clear()
  }

  test("DML edge cases: qualifiers, case, raw dirs, schema evolution") {
    val t = freshDir() + "/trades"
    seed(t) // (1,XLON,10),(2,XPAR,20),(3,XLON,30)
    GraftSqlTables.register("spec_edge", t, readOnly = false)
    try {
      // alias- and table-name-qualified condition columns resolve
      spark.sql("UPDATE graft.spec_edge AS t SET price = t.price + 1.0D " +
        "WHERE t.id = 1L")
      spark.sql("DELETE FROM graft.spec_edge WHERE spec_edge.id = 2L")
      assert(spark.sql("SELECT sum(price) AS p FROM graft.spec_edge")
        .head().getDouble(0) == 41.0) // 11 + 30
      // SET targets resolve case-insensitively, like Spark identifiers
      spark.sql("UPDATE graft.spec_edge SET PRICE = 0.0D WHERE id = 3L")
      assert(spark.sql("SELECT sum(price) AS p FROM graft.spec_edge")
        .head().getDouble(0) == 11.0)
      // ... and a case-variant duplicate assignment is still refused
      val dup = intercept[IllegalArgumentException] {
        spark.sql(
          "UPDATE graft.spec_edge SET price = 1.0D, PRICE = 2.0D")
      }
      assert(dup.getMessage.contains("more than once"))
      // an ON conjunct that does not relate target to source refuses
      val selfEq = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO graft.spec_edge t USING " +
          "(SELECT 1L AS id) s ON t.id = t.id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      assert(selfEq.getMessage.contains("relating target to source"))
      // extra source columns refuse without WITH SCHEMA EVOLUTION...
      val extra = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO graft.spec_edge t USING " +
          "(SELECT 9L AS id, 'XAMS' AS mic, 9.0D AS price, " +
          "'oops' AS surprise) s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      assert(extra.getMessage.contains("SCHEMA EVOLUTION"))
      // ...and append to the target schema with it
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO graft.spec_edge t " +
        "USING (SELECT 9L AS id, 'XAMS' AS mic, 9.0D AS price, " +
        "'new' AS note) s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
      val cols = spark.sql("SELECT * FROM graft.spec_edge").columns.toSeq
      assert(cols.contains("note"))
      // DELETE/UPDATE on a raw parquet dir (no log) error loudly
      // instead of silently no-opping
      val raw = freshDir() + "/raw"
      Seq((1L, 1.0)).toDF("id", "v").write.parquet(raw)
      GraftSqlTables.register("spec_edge_raw", raw, readOnly = false)
      val e1 = intercept[IllegalArgumentException] {
        spark.sql("DELETE FROM graft.spec_edge_raw WHERE id = 1L")
      }
      assert(e1.getMessage.contains("_delta_log"))
      val e2 = intercept[IllegalArgumentException] {
        spark.sql("UPDATE graft.spec_edge_raw SET v = 0.0D")
      }
      assert(e2.getMessage.contains("_delta_log"))
      // MERGE into a raw dir refuses too (a first commit would orphan
      // the existing rows)
      val e3 = intercept[IllegalArgumentException] {
        spark.sql("MERGE INTO graft.spec_edge_raw t USING " +
          "(SELECT 1L AS id, 2.0D AS v) s ON t.id = s.id " +
          "WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *")
      }
      assert(e3.getMessage.contains("orphan"))
    } finally GraftSqlTables.clear()
  }

  test("CALL procedures: lifecycle maintenance through SQL") {
    val t = freshDir() + "/trades"
    seed(t)
    MiniDelta.append(spark,
      Seq((4L, "XMIL", 40.0)).toDF("id", "mic", "price"), t, Seq("mic"))
    GraftSqlTables.register("spec_proc", t, readOnly = false)
    try {
      // history: newest first, operations named
      val hist = spark.sql("CALL graft.history('spec_proc')")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(hist.length == 2 && hist.head == ((1L, "WRITE")))
      // optimize compacts to one file per partition; data unchanged
      val v2 = spark.sql("CALL graft.optimize('spec_proc')")
        .head().getLong(0)
      assert(v2 == 2L)
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_proc")
        .head().getLong(0) == 4)
      // restore pins back to v0 (3 rows) while its files still exist
      spark.sql("CALL graft.restore('spec_proc', 0)")
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_proc")
        .head().getLong(0) == 3)
      // vacuum drops the files the restore de-referenced
      val deleted = spark.sql("CALL graft.vacuum('spec_proc', 0)")
        .head().getLong(0)
      assert(deleted > 0)
      // clone forks to a WRITABLE registered alias (an arbitrary raw
      // path would bypass the per-alias write governance), zero copy;
      // checkpoint rolls one up
      val fork = freshDir() + "/fork"
      GraftSqlTables.register("spec_proc_fork", fork, readOnly = false)
      spark.sql("CALL graft.clone('spec_proc', 'spec_proc_fork')")
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_proc_fork")
        .head().getLong(0) == 3)
      // ...and a read-only target refuses the clone
      GraftSqlTables.register("spec_proc_fork_ro", freshDir() + "/ro")
      intercept[MiniDelta.ReadOnlyTableException] {
        spark.sql("CALL graft.clone('spec_proc', 'spec_proc_fork_ro')")
      }
      spark.sql("CALL graft.checkpoint('spec_proc')")
      // read-only aliases refuse mutating procedures, allow history
      GraftSqlTables.register("spec_proc_ro", t)
      assert(spark.sql("CALL graft.history('spec_proc_ro')")
        .count() >= 2)
      intercept[MiniDelta.ReadOnlyTableException] {
        spark.sql("CALL graft.optimize('spec_proc_ro')")
      }
      // unknown procedure names the available set
      val e = intercept[Exception] {
        spark.sql("CALL graft.no_such_proc('x')")
      }
      assert(e.getMessage.contains("unknown graft procedure") ||
        e.getMessage.contains("no_such_proc"))
    } finally GraftSqlTables.clear()
  }

  test("SHOW TABLES lists registered aliases; SHOW PROCEDURES lists CALLs") {
    GraftSqlTables.register("alpha", "/tmp/graft_show_a")
    GraftSqlTables.register("beta", "/tmp/graft_show_b")
    try {
      val tables = spark.sql("SHOW TABLES IN graft.datalake")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(Set("alpha", "beta").subsetOf(tables))
      val procs = spark.sql("SHOW PROCEDURES IN graft")
        .collect().map(_.toSeq.mkString(",")).mkString(";")
      assert(procs.contains("vacuum") && procs.contains("restore") &&
        procs.contains("convert_to_delta"))
    } finally GraftSqlTables.clear()
  }

  test("SHOW PARTITIONS: k=v wire shape from log metadata; refusals") {
    val t = freshDir() + "/trades"
    seed(t)
    GraftSqlTables.register("spec_showpart", t)
    try {
      val parts = spark.sql("SHOW PARTITIONS graft.spec_showpart")
        .collect().map(_.getString(0)).toSeq
      assert(parts == Seq("mic=XLON", "mic=XPAR"))
      // unpartitioned table refuses by name, like Spark's own exec
      val u = freshDir() + "/flat"
      MiniDelta.append(spark, Seq((1L, 2.0)).toDF("id", "v"), u, Seq.empty)
      GraftSqlTables.register("spec_showpart_flat", u)
      val e = intercept[Exception](
        spark.sql("SHOW PARTITIONS graft.spec_showpart_flat").collect())
      assert(e.getMessage.contains("not partitioned"))
      // PARTITION(spec) filter refuses by name (full listing + WHERE
      // is the supported shape)
      val e2 = intercept[Exception](
        spark.sql(
          "SHOW PARTITIONS graft.spec_showpart PARTITION (mic='XLON')")
          .collect())
      assert(e2.getMessage.contains("not supported"))
    } finally GraftSqlTables.clear()
  }

  test("SHOW TBLPROPERTIES: full listing, keyed lookup, absent key") {
    val t = freshDir() + "/trades"
    seed(t)
    MiniDelta.setTableProperties(spark, t,
      Map("delta.appendOnly" -> "false", "delta.checkpointInterval" -> "7"))
    GraftSqlTables.register("spec_props", t)
    try {
      val all = spark.sql("SHOW TBLPROPERTIES graft.spec_props")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(all("delta.appendOnly") == "false")
      assert(all("delta.checkpointInterval") == "7")
      val keyed = spark.sql(
        "SHOW TBLPROPERTIES graft.spec_props ('delta.checkpointInterval')")
        .collect()
      assert(keyed.length == 1 && keyed.head.getString(1) == "7")
      assert(spark.sql(
        "SHOW TBLPROPERTIES graft.spec_props ('delta.nope')").isEmpty)
    } finally GraftSqlTables.clear()
  }

  test("DESCRIBE TABLE: declared schema + partition section + EXTENDED") {
    val t = freshDir() + "/trades"
    seed(t)
    GraftSqlTables.register("spec_desc", t)
    try {
      val rows = spark.sql("DESCRIBE TABLE graft.spec_desc")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.take(3).toSeq ==
        Seq(("id", "bigint"), ("mic", "string"), ("price", "double")))
      assert(rows.contains(("# Partition Information", "")))
      assert(rows.count(_._1 == "mic") == 2) // schema row + partition row
      val ext = spark.sql("DESCRIBE EXTENDED graft.datalake.spec_desc")
        .collect().map(r => (r.getString(0), r.getString(1))).toMap
      assert(ext("Provider") == "graft-delta")
      assert(ext("Location") == t)
      assert(ext("Read Only") == "true")
    } finally GraftSqlTables.clear()
  }

  test("CALL graft.detail: snapshot facts from log metadata") {
    val t = freshDir() + "/trades"
    MiniDelta.append(spark,
      Seq((1L, "XLON", 10.0), (2L, "XPAR", 20.0), (3L, "XLON", 30.0))
        .toDF("id", "mic", "price").coalesce(1),
      t, Seq("mic"), statsCols = Seq("id"))
    GraftSqlTables.register("spec_detail", t)
    try {
      val r = spark.sql("CALL graft.detail('spec_detail')").head()
      assert(r.getAs[String]("format") == "graft-delta")
      assert(r.getAs[scala.collection.Seq[String]]("partitionColumns")
        .toSeq == Seq("mic"))
      assert(r.getAs[Long]("numFiles") == 2)
      assert(r.getAs[Long]("numRows") == 3)
      assert(r.getAs[Long]("sizeInBytes") > 0)
      assert(r.getAs[Int]("minReaderVersion") == 1)
      // numRows is LIVE rows: a DV delete subtracts its cardinality
      // without rewriting files; a stats-less append nulls it (a
      // partial sum would read as exact)
      MiniDelta.setTableProperties(spark, t,
        Map("delta.enableDeletionVectors" -> "true"))
      MiniDelta.delete(spark, t, col("id") === 1L, Seq("mic"))
      MiniDelta.invalidateSnapshot(t)
      val r2 = spark.sql("CALL graft.detail('spec_detail')").head()
      assert(r2.getAs[Long]("numRows") == 2)
      // since r14 an empty statsCols DEFAULTS stats, so the append
      // keeps numRows exact; a GENUINELY stat-less add (property 0)
      // nulls it — a partial sum would read as exact
      MiniDelta.append(spark, Seq((9L, "XAMS", 1.0)).toDF("id", "mic",
        "price"), t, Seq("mic"))
      MiniDelta.invalidateSnapshot(t)
      val r3 = spark.sql("CALL graft.detail('spec_detail')").head()
      assert(r3.getAs[Long]("numRows") == 3)
      MiniDelta.setTableProperties(spark, t,
        Map("delta.dataSkippingNumIndexedCols" -> "0"))
      MiniDelta.append(spark, Seq((10L, "XAMS", 1.0)).toDF("id", "mic",
        "price"), t, Seq("mic")) // stat-less for real
      MiniDelta.invalidateSnapshot(t)
      val r4 = spark.sql("CALL graft.detail('spec_detail')").head()
      assert(r4.isNullAt(r4.fieldIndex("numRows")))
      // raw parquet alias: format parquet, listing-derived counts
      val raw = freshDir() + "/raw"
      Seq((1, 2)).toDF("a", "b").write.parquet(raw)
      GraftSqlTables.register("spec_detail_raw", raw)
      val rr = spark.sql("CALL graft.detail('spec_detail_raw')").head()
      assert(rr.getAs[String]("format") == "parquet")
      assert(rr.getAs[Long]("numFiles") > 0)
      assert(rr.isNullAt(rr.fieldIndex("minReaderVersion")))
    } finally GraftSqlTables.clear()
  }

  test("table_changes: version + timestamp bounds, output shape") {
    val t = freshDir() + "/trades"
    seed(t) // v0: append
    MiniDelta.delete(spark, t, col("id") === 1L, Seq("mic")) // v1
    GraftSqlTables.register("spec_tc", t)
    try {
      val df = spark.sql("SELECT * FROM table_changes('spec_tc', 1)")
      // Delta's output shape: table columns, then the three CDF columns
      assert(df.columns.toSeq.takeRight(3) ==
        Seq("_change_type", "_commit_version", "_commit_timestamp"))
      val rows = df.collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("_change_type") == "delete")
      assert(rows.head.getAs[Long]("_commit_version") == 1L)
      assert(rows.head.getAs[java.sql.Timestamp]("_commit_timestamp") != null)
      // 3-arg window + qualified alias: just v0, all inserts
      val v0 = spark.sql(
        "SELECT * FROM table_changes('graft.spec_tc', 0, 0)").collect()
      assert(v0.length == 3 &&
        v0.forall(_.getAs[String]("_change_type") == "insert"))
      // timestamp START bound predating the table starts at version 0
      val all = spark.sql("SELECT count(*) AS n FROM " +
        "table_changes('spec_tc', '1970-01-02 00:00:00')").head().getLong(0)
      assert(all == 4) // 3 inserts + 1 delete
      // an unregistered alias refuses by name
      val miss = intercept[Exception](
        spark.sql("SELECT * FROM table_changes('nope', 0)").collect())
      assert(miss.getMessage.contains("not a registered graft alias"))
      // non-literal bounds refuse by name
      val e = intercept[Exception](
        spark.sql("SELECT * FROM table_changes('spec_tc', id)").collect())
    } finally GraftSqlTables.clear()
  }

  test("maintenance verbs: OPTIMIZE / VACUUM / DESCRIBE DETAIL|HISTORY / RESTORE") {
    val t = freshDir() + "/trades"
    seed(t); seed(t) // two appends -> 2 files per partition
    GraftSqlTables.register("spec_mx", t, readOnly = false)
    try {
      def filesPer(mic: String): Long =
        MiniDelta.snapshotFiles(spark, t)
          .where(element_at(col("partitionValues"), "mic") === mic).count()
      val xparBefore = filesPer("XPAR")
      assert(filesPer("XLON") > 1 && xparBefore > 1)
      // WHERE scopes the compaction to the named partition only
      val v = spark.sql("OPTIMIZE graft.spec_mx WHERE mic = 'XLON'")
        .head().getLong(0)
      assert(v == 2L)
      MiniDelta.invalidateSnapshot(t)
      assert(filesPer("XLON") == 1 && filesPer("XPAR") == xparBefore)
      // ZORDER BY compacts the rest (bare verb form)
      spark.sql("OPTIMIZE spec_mx ZORDER BY (id)").collect()
      MiniDelta.invalidateSnapshot(t)
      assert(filesPer("XPAR") == 1)
      // non-partition WHERE column refuses by name
      val bad = intercept[Exception](
        spark.sql("OPTIMIZE graft.spec_mx WHERE id = 1").collect())
      assert(bad.getMessage.contains("non-partition"))
      // DESCRIBE DETAIL / HISTORY parser verbs
      val det = spark.sql("DESCRIBE DETAIL graft.spec_mx").head()
      assert(det.getAs[String]("format") == "graft-delta")
      val hist = spark.sql("DESC HISTORY graft.spec_mx LIMIT 2").collect()
      assert(hist.length == 2 &&
        hist.head.getLong(0) > hist.last.getLong(0))
      // RESTORE back to v0 (one seed batch) — BEFORE any vacuum, while
      // v0's files still exist (restore past the horizon refuses)
      spark.sql("RESTORE TABLE graft.spec_mx TO VERSION AS OF 0").collect()
      MiniDelta.invalidateSnapshot(t)
      assert(spark.sql("SELECT count(*) AS n FROM graft.spec_mx")
        .head().getLong(0) == 3L)
      // VACUUM with explicit zero retention deletes the files the
      // restore de-referenced; default retention (no RETAIN) keeps them
      assert(spark.sql("VACUUM graft.spec_mx").head().getLong(0) == 0L)
      // a RETAIN below the configured horizon REFUSES by default
      // (Delta's retention-duration check) and names the override
      val short = intercept[Exception](
        spark.sql("VACUUM graft.spec_mx RETAIN 0 HOURS").collect())
      assert(short.getMessage.contains("retentionDurationCheck"),
        short.getMessage)
      spark.conf.set(
        "spark.graft.vacuum.retentionDurationCheck.enabled", "false")
      try assert(spark.sql("VACUUM graft.spec_mx RETAIN 0 HOURS")
        .head().getLong(0) > 0L)
      finally spark.conf.unset(
        "spark.graft.vacuum.retentionDurationCheck.enabled")
      // read-only alias refuses mutating verbs, serves describing ones
      GraftSqlTables.register("spec_mx_ro", t)
      intercept[MiniDelta.ReadOnlyTableException](
        spark.sql("OPTIMIZE graft.spec_mx_ro").collect())
      intercept[MiniDelta.ReadOnlyTableException](
        spark.sql("VACUUM graft.spec_mx_ro").collect())
      assert(spark.sql("DESCRIBE DETAIL graft.spec_mx_ro").count() == 1)
      // unregistered identifiers delegate to Spark's parser untouched
      intercept[Exception](spark.sql("OPTIMIZE some.other.table"))
    } finally GraftSqlTables.clear()
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES round-trips through SQL") {
    val t = freshDir() + "/trades"
    seed(t)
    GraftSqlTables.register("spec_props_rw", t, readOnly = false)
    try {
      spark.sql("ALTER TABLE graft.spec_props_rw SET TBLPROPERTIES " +
        "('delta.appendOnly' = 'false', 'delta.checkpointInterval' = '9')")
      def props() = spark.sql("SHOW TBLPROPERTIES graft.spec_props_rw")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props() == Map("delta.appendOnly" -> "false",
        "delta.checkpointInterval" -> "9"))
      spark.sql("ALTER TABLE graft.spec_props_rw UNSET TBLPROPERTIES " +
        "('delta.appendOnly')")
      assert(props() == Map("delta.checkpointInterval" -> "9"))
      // absent key refuses without IF EXISTS, skips with it
      val e = intercept[Exception](
        spark.sql("ALTER TABLE graft.spec_props_rw UNSET TBLPROPERTIES " +
          "('delta.nope')"))
      assert(e.getMessage.contains("not set"))
      spark.sql("ALTER TABLE graft.spec_props_rw UNSET TBLPROPERTIES " +
        "IF EXISTS ('delta.nope')")
      assert(props() == Map("delta.checkpointInterval" -> "9"))
      // read-only alias refuses both directions
      GraftSqlTables.register("spec_props_ro", t)
      intercept[MiniDelta.ReadOnlyTableException](
        spark.sql("ALTER TABLE graft.spec_props_ro SET TBLPROPERTIES " +
          "('delta.appendOnly' = 'true')"))
      intercept[MiniDelta.ReadOnlyTableException](
        spark.sql("ALTER TABLE graft.spec_props_ro UNSET TBLPROPERTIES " +
          "IF EXISTS ('delta.appendOnly')"))
    } finally GraftSqlTables.clear()
  }

  test("SQL column mapping: enable via SET, RENAME COLUMN, DROP COLUMN") {
    val t = freshDir() + "/t"
    MiniDelta.append(spark,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "tag", "price"),
      t, Seq.empty)
    GraftSqlTables.register("spec_cm", t, readOnly = false)
    try {
      spark.sql("ALTER TABLE graft.spec_cm SET TBLPROPERTIES " +
        "('delta.columnMapping.mode' = 'name')")
      spark.sql("ALTER TABLE graft.spec_cm RENAME COLUMN price TO px")
      MiniDelta.invalidateSnapshot(t)
      assert(spark.sql("SELECT sum(px) AS s FROM graft.spec_cm")
        .head().getDouble(0) == 30.0)
      spark.sql("ALTER TABLE graft.spec_cm DROP COLUMN tag")
      MiniDelta.invalidateSnapshot(t)
      val cols = spark.sql("DESCRIBE TABLE graft.spec_cm")
        .collect().map(_.getString(0)).toSeq
      assert(cols.contains("px") && !cols.contains("tag") &&
        !cols.contains("price"))
      // INSERT into the renamed schema lands physical-named parquet
      spark.sql("INSERT INTO graft.spec_cm VALUES (3, 40.0)")
      MiniDelta.invalidateSnapshot(t)
      assert(spark.sql("SELECT sum(px) AS s FROM graft.spec_cm")
        .head().getDouble(0) == 70.0)
      // read-only alias refuses the whole family
      GraftSqlTables.register("spec_cm_ro", t)
      intercept[MiniDelta.ReadOnlyTableException](spark.sql(
        "ALTER TABLE graft.spec_cm_ro RENAME COLUMN px TO q"))
      intercept[MiniDelta.ReadOnlyTableException](spark.sql(
        "ALTER TABLE graft.spec_cm_ro DROP COLUMN px"))
    } finally GraftSqlTables.clear()
  }

  test("SQL constraints: ADD CONSTRAINT validates, arms; DROP disarms") {
    val t = freshDir() + "/trades"
    seed(t)
    GraftSqlTables.register("spec_ck", t, readOnly = false)
    try {
      // arming against existing violations refuses
      intercept[Exception](spark.sql(
        "ALTER TABLE graft.spec_ck ADD CONSTRAINT pos CHECK (price > 15)"))
      spark.sql(
        "ALTER TABLE graft.spec_ck ADD CONSTRAINT pos CHECK (price > 0)")
      // the armed invariant rejects violating inserts
      val e = intercept[Exception](spark.sql(
        "INSERT INTO graft.spec_ck VALUES (9, 'XAMS', -1.0)"))
      assert(e.getMessage.toLowerCase.contains("constraint") ||
        e.getMessage.contains("pos"))
      // DROP disarms; IF EXISTS tolerates absence
      spark.sql("ALTER TABLE graft.spec_ck DROP CONSTRAINT pos")
      spark.sql("INSERT INTO graft.spec_ck VALUES (9, 'XAMS', -1.0)")
      spark.sql(
        "ALTER TABLE graft.spec_ck DROP CONSTRAINT IF EXISTS nope")
      intercept[Exception](spark.sql(
        "ALTER TABLE graft.spec_ck DROP CONSTRAINT nope"))
    } finally GraftSqlTables.clear()
  }

  test("SQL GENERATED / IDENTITY column declarations reach the writers") {
    val dir = freshDir()
    GraftSqlTables.unregister("spec_gen_sql")
    spark.sql(s"""
      CREATE TABLE graft.spec_gen_sql (
        id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 5),
        ts BIGINT,
        bucket BIGINT GENERATED ALWAYS AS (ts % 4)
      ) LOCATION '$dir/t'""")
    try {
      // the column list omits id + bucket: identity assigns, generated
      // computes
      spark.sql(
        "INSERT INTO graft.spec_gen_sql (ts) VALUES (7), (9), (11)")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val rows = spark.sql(
        "SELECT id, ts, bucket FROM graft.spec_gen_sql ORDER BY ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.map(_._2).toSeq == Seq(7L, 9L, 11L))
      assert(rows.map(_._3).toSeq == Seq(3L, 1L, 3L)) // ts % 4
      assert(rows.map(_._1).sorted.toSeq == Seq(5L, 10L, 15L))
      // explicit identity values refuse (GENERATED ALWAYS), and a
      // mismatched generated value refuses
      val e1 = intercept[Exception](spark.sql(
        "INSERT INTO graft.spec_gen_sql VALUES (99, 1, 1)"))
      assert(e1.getMessage.contains("GENERATED ALWAYS"))
      val e2 = intercept[Exception](spark.sql(
        "INSERT INTO graft.spec_gen_sql (ts, bucket) VALUES (8, 1)"))
      assert(e2.getMessage.contains("generated column"))
      // a non-generated omission still refuses by name
      val tPlain = freshDir() + "/plain"
      seed(tPlain)
      GraftSqlTables.register("spec_gen_plain", tPlain, readOnly = false)
      val e3 = intercept[Exception](spark.sql(
        "INSERT INTO graft.spec_gen_plain (id) VALUES (9)"))
      assert(e3.getMessage.contains("missing"))
      // SQL MERGE composes with identity + generated (late r13): the
      // source omits both, the matched row (ts=7) KEEPS its id, the
      // insert (ts=13) extends the chain to 20, bucket recomputes
      val idOf7 = spark.sql(
        "SELECT id FROM graft.spec_gen_sql WHERE ts = 7")
        .head().getLong(0)
      spark.sql("""
        MERGE INTO graft.spec_gen_sql t
        USING (SELECT 7L AS ts UNION ALL SELECT 13L) s
        ON t.ts = s.ts
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val afterMerge = spark.sql(
        "SELECT ts, id, bucket FROM graft.spec_gen_sql ORDER BY ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(afterMerge.map(_._1).toSeq == Seq(7L, 9L, 11L, 13L))
      assert(afterMerge.find(_._1 == 7L).get._2 == idOf7) // id survives
      assert(afterMerge.find(_._1 == 13L).get._2 == 20L)  // chain walks
      assert(afterMerge.find(_._1 == 13L).get._3 == 1L)   // 13 % 4
      // SQL INSERT OVERWRITE composes too: the swap assigns PAST the
      // surviving mark (25, 30 — never a reset to 5)
      spark.sql(
        "INSERT OVERWRITE graft.spec_gen_sql (ts) VALUES (2), (4)")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val afterOv = spark.sql(
        "SELECT id, ts, bucket FROM graft.spec_gen_sql ORDER BY ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(afterOv.map(_._2).toSeq == Seq(2L, 4L))
      assert(afterOv.map(_._1).sorted.toSeq == Seq(25L, 30L), afterOv)
      assert(afterOv.map(_._3).toSeq == Seq(2L, 0L))
    } finally GraftSqlTables.clear()
  }

  test("SQL column DEFAULTs: CREATE, omitted INSERT, SET/DROP DEFAULT") {
    val dir = freshDir()
    GraftSqlTables.unregister("spec_def")
    spark.sql(s"""
      CREATE TABLE graft.spec_def (
        id BIGINT,
        status STRING DEFAULT 'new',
        score DOUBLE
      ) LOCATION '$dir/t'""")
    try {
      // the column-list INSERT may omit the defaulted column — the
      // write MATERIALIZES the fill (allowColumnDefaults' contract)
      spark.sql("INSERT INTO graft.spec_def (id, score) VALUES (1, 0.1)")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql("SELECT status FROM graft.spec_def WHERE id = 1")
        .head().getString(0) == "new")
      // a non-defaulted omission still refuses by name
      val e = intercept[Exception](spark.sql(
        "INSERT INTO graft.spec_def (id) VALUES (9)"))
      assert(e.getMessage.contains("missing"), e.getMessage)
      // SET DEFAULT: future inserts fill; the id=1 row is untouched
      spark.sql("ALTER TABLE graft.spec_def " +
        "ALTER COLUMN score SET DEFAULT 9.9D")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      spark.sql("INSERT INTO graft.spec_def (id) VALUES (2)")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val rows = spark.sql(
        "SELECT id, status, score FROM graft.spec_def ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, "new", 0.1), (2L, "new", 9.9)), rows)
      // DROP DEFAULT: the column-list omission refuses again (the
      // fill obligation is gone, and a silent null-fill would hide a
      // mistyped column name — the command's standing rule)
      spark.sql("ALTER TABLE graft.spec_def " +
        "ALTER COLUMN score DROP DEFAULT")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val e3 = intercept[Exception](spark.sql(
        "INSERT INTO graft.spec_def (id) VALUES (3)"))
      assert(e3.getMessage.contains("missing"), e3.getMessage)
      // a non-widening TYPE change refuses by name (TYPE routes to the
      // typeWidening path); COMMENT is its own metadata verb since r18
      val e2 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.spec_def ALTER COLUMN score TYPE STRING"))
      assert(e2.getMessage.contains("widen"), e2.getMessage)
      spark.sql("ALTER TABLE graft.spec_def ALTER COLUMN score " +
        "COMMENT 'x'")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(MiniDelta.latestSchema(spark, s"$dir/t").get("score")
        .metadata.getString("comment") == "x")
    } finally GraftSqlTables.clear()
  }

  test("SHOW CREATE renders DEFAULT/GENERATED/IDENTITY/CLUSTER BY and re-runs") {
    val dir = freshDir()
    GraftSqlTables.unregister("spec_sct")
    GraftSqlTables.unregister("spec_sct2")
    spark.sql(s"""
      CREATE TABLE graft.spec_sct (
        id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 7 INCREMENT BY 2),
        ts BIGINT,
        bucket BIGINT GENERATED ALWAYS AS (ts % 4),
        status STRING DEFAULT 'new'
      ) CLUSTER BY (ts) LOCATION '$dir/t'""")
    try {
      val stmt = spark.sql("SHOW CREATE TABLE graft.spec_sct")
        .head().getString(0)
      assert(stmt.contains("DEFAULT 'new'"), stmt)
      assert(stmt.contains(
        "GENERATED ALWAYS AS IDENTITY (START WITH 7 INCREMENT BY 2)"),
        stmt)
      assert(stmt.contains("GENERATED ALWAYS AS (ts % 4)"), stmt)
      assert(stmt.contains("CLUSTER BY (`ts`)"), stmt)
      // the statement re-runs into a table with the SAME write contract
      // the rendered LOCATION is the RESOLVED path (file: scheme), so
      // swap just the trailing directory name
      val stmt2 = stmt
        .replace("graft.spec_sct", "graft.spec_sct2")
        .replace("/t'", "/t2'")
      spark.sql(stmt2)
      spark.sql("INSERT INTO graft.spec_sct2 (ts) VALUES (9)")
      MiniDelta.invalidateSnapshot(s"$dir/t2")
      val r = spark.sql(
        "SELECT id, ts, bucket, status FROM graft.spec_sct2").head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
        == ((7L, 9L, 1L, "new")), r)
      assert(MiniDelta.clusteringColumns(spark, s"$dir/t2") == Seq("ts"))
    } finally GraftSqlTables.clear()
  }

  test("partition layout survives an all-rows delete (metaData fallback)") {
    val t = freshDir() + "/trades"
    seed(t)
    assert(MiniDelta.partitionColumns(spark, t) == Seq("mic"))
    MiniDelta.delete(spark, t, col("id") >= 0L, Seq("mic"))
    // snapshot momentarily empty: the layout must come from the log's
    // metaData, not flip to unpartitioned
    assert(MiniDelta.partitionColumns(spark, t) == Seq("mic"))
    GraftSqlTables.register("spec_empty", t, readOnly = false)
    try {
      spark.sql("INSERT INTO graft.spec_empty " +
        "SELECT 5L AS id, 'XLON' AS mic, 50.0D AS price")
      assert(MiniDelta.partitionColumns(spark, t) == Seq("mic"))
    } finally GraftSqlTables.clear()
  }
}
